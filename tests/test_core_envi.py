"""ENVI I/O round-trip tests (reference contract: srcfinder_util.py openimg/
openmm, robust_mf.py memmap access patterns)."""

import numpy as np
import pytest

from srcfinder_tpu.core import envi


@pytest.mark.parametrize("interleave", ["bil", "bip", "bsq"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int16, np.uint8])
def test_roundtrip(tmp_path, interleave, dtype, rng):
    arr = rng.normal(size=(7, 5, 3)).astype(dtype)
    hdr = str(tmp_path / "img.hdr")
    meta = {"data ignore value": -9999, "description": "test image"}
    envi.save_envi(hdr, arr, metadata=meta, interleave=interleave)

    img = envi.open_envi(str(tmp_path / "img"))
    assert img.shape == (7, 5, 3)
    assert img.interleave == interleave
    assert img.nodata == -9999
    np.testing.assert_array_equal(img.load(), arr)
    # source memmap layout matches interleave
    mm = img.open_memmap(interleave="source")
    expect = {"bil": (7, 3, 5), "bip": (7, 5, 3), "bsq": (3, 7, 5)}[interleave]
    assert mm.shape == expect


def test_source_memmap_bil_column_access(tmp_path, rng):
    """The CMF hot loop reads img_mm[:, band_lo:band_hi, col]
    (reference: robust_mf.py:297-298)."""
    arr = rng.normal(size=(10, 6, 8)).astype(np.float32)  # lines, samples, bands
    hdr = str(tmp_path / "rdn.hdr")
    envi.save_envi(hdr, arr, interleave="bil")
    img = envi.open_envi(hdr)
    mm = img.open_memmap(interleave="source")  # (lines, bands, samples)
    col3 = np.asarray(mm[:, 2:5, 3])
    np.testing.assert_array_equal(col3, arr[:, 3, 2:5])


def test_header_roundtrip(tmp_path):
    meta = {
        "samples": 5, "lines": 4, "bands": 2, "data type": 4,
        "interleave": "bip", "byte order": 0, "header offset": 0,
        "map info": ["UTM", "1", "1", "272247.152557", "3992010.65018",
                     "3.1", "3.1", "11", "North", "WGS-84",
                     "units=Meters", "rotation=17.0000000"],
        "band names": ["Red", "Green"],
        "description": "multi word description",
        "data ignore value": "-9999",
    }
    hdrf = str(tmp_path / "t.hdr")
    envi.write_header(hdrf, meta)
    back = envi.read_header(hdrf)
    assert back["samples"] == "5"
    assert back["map info"][0] == "UTM"
    assert back["map info"][11] == "rotation=17.0000000"
    assert back["band names"] == ["Red", "Green"]
    assert back["description"] == "multi word description"


def test_read_reference_style_header(tmp_path):
    """Parse a header in the exact shape the reference repo ships
    (cnn/samples/ang20200924t211102_ch4mf_v2y1_img.hdr)."""
    text = """ENVI
description = {
  AVIRIS-NG Measured Radiances in uW nm-1 cm-2 sr-1}
samples = 669
lines = 2801
bands = 4
header offset = 0
file type = ENVI
data type = 5
interleave = bip
byte order = 0
map info = {UTM, 1, 1, 272247.152557, 3992010.65018, 3.1, 3.1, 11, North, WGS-84, units=Meters, rotation=17.0000000}
band names = { Red Radiance (uW/nm/sr/cm2) , Green Radiance (uW/nm/sr/cm2) , Blue Radiance (uW/nm/sr/cm2) , CH4 Absorption (ppm x m) }
model parameters = { modelname=looshrinkage , bgmodel=unimodal , aminexp=-10.0 , amaxexp=0.0 , astep=0.05 , reflectance=False , active_bands=[351 , 422] }
data ignore value = -9999
"""
    hdrf = tmp_path / "ref.hdr"
    hdrf.write_text(text)
    meta = envi.read_header(str(hdrf))
    assert meta["samples"] == "669"
    assert meta["lines"] == "2801"
    assert meta["data type"] == "5"
    assert meta["map info"][7] == "11"
    assert len(meta["band names"]) == 4
    assert meta["data ignore value"] == "-9999"


def test_read_subregion(tmp_path, rng):
    arr = (rng.normal(size=(20, 9, 4)) * 10).astype(np.float32)
    hdr = str(tmp_path / "blk.hdr")
    envi.save_envi(hdr, arr, interleave="bil")
    img = envi.open_envi(hdr)
    blk = img.read_subregion((5, 12), (2, 7))
    np.testing.assert_array_equal(blk, arr[5:12, 2:7, :])


def test_create_envi_writable(tmp_path):
    meta = {"samples": 4, "lines": 3, "bands": 2, "data type": 4,
            "interleave": "bip"}
    img = envi.create_envi(str(tmp_path / "out.hdr"), meta)
    mm = img.open_memmap(writable=True)
    assert mm.shape == (3, 4, 2)
    mm[:, :, -1] = -9999
    mm.flush()
    img2 = envi.open_envi(str(tmp_path / "out.hdr"))
    assert (img2.load()[..., -1] == -9999).all()
    assert (img2.load()[..., 0] == 0).all()


def test_dtype_codes():
    assert envi.dtype_to_envi(np.float64) == 5
    assert envi.dtype_to_envi(np.float32) == 4
    assert envi.dtype_to_envi(np.int16) == 2
    assert envi.envi_to_dtype(5) == np.dtype("<f8")
    assert envi.envi_to_dtype(12) == np.dtype("<u2")


# ---------------------------------------------------------------------------
# core.directio: O_DIRECT reads (SCALING.md "Host I/O" — 640 MB/s cold vs
# 13 MB/s through the page cache on the deployment VM)
# ---------------------------------------------------------------------------

def test_directfile_read_range_equivalence(tmp_path, rng):
    from srcfinder_tpu.core.directio import DirectFile
    data = rng.integers(0, 256, size=3_000_000, dtype=np.uint8).tobytes()
    p = tmp_path / "blob.bin"
    p.write_bytes(data)
    with DirectFile(str(p)) as df:
        # odd offsets/lengths spanning alignment boundaries and EOF tail
        cases = [(0, 4096), (1, 4095), (4095, 2), (4096, 4096),
                 (123_457, 777_001), (len(data) - 5, 5),
                 (len(data) - 4097, 4097), (0, len(data))]
        for off, n in cases:
            got = df.read_range(off, n)
            assert got.tobytes() == data[off:off + n], (off, n, df.direct)
        with pytest.raises(ValueError):
            df.read_range(len(data) - 1, 2)      # past EOF
        assert df.read_range(5, 0).size == 0


def test_directfile_buffered_fallback(tmp_path, rng, monkeypatch):
    from srcfinder_tpu.core import directio
    monkeypatch.setenv("SRCFINDER_DIRECT_IO", "0")
    data = rng.integers(0, 256, size=100_000, dtype=np.uint8).tobytes()
    p = tmp_path / "blob.bin"
    p.write_bytes(data)
    with directio.DirectFile(str(p)) as df:
        assert not df.direct
        assert df.read_range(777, 9999).tobytes() == data[777:777 + 9999]


def test_directfile_read_strided(tmp_path, rng):
    from srcfinder_tpu.core.directio import DirectFile
    arr = rng.integers(0, 256, size=(64, 1000), dtype=np.uint8)
    p = tmp_path / "rows.bin"
    p.write_bytes(arr.tobytes())
    with DirectFile(str(p)) as df:
        # every 3rd row (gaps defeat coalescing) and all rows (coalesced)
        offs = [r * 1000 for r in range(0, 64, 3)]
        got = df.read_strided(offs, 1000)
        np.testing.assert_array_equal(got, arr[::3])
        got = df.read_strided([r * 1000 for r in range(64)], 1000)
        np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("interleave", ["bil", "bip", "bsq"])
def test_read_lines_and_band_window_match_memmap(tmp_path, rng, interleave):
    arr = rng.normal(size=(23, 9, 17)).astype(np.float32)
    hdr = str(tmp_path / "img.hdr")
    envi.save_envi(hdr, arr, metadata={}, interleave=interleave)
    img = envi.open_envi(str(tmp_path / "img"))
    np.testing.assert_array_equal(np.asarray(img.read_lines(4, 19)),
                                  arr[4:19])
    np.testing.assert_array_equal(np.asarray(img.read_lines(0, 23)), arr)
    win = img.read_band_window(5, 13)            # (lines, bands, samples)
    np.testing.assert_array_equal(
        win, arr[:, :, 5:13].transpose(0, 2, 1))
