"""GeoTIFF writer/reader and product loaders tests."""

import os

import numpy as np
import pandas as pd
import pytest

from srcfinder_tpu.core import envi as envi_io
from srcfinder_tpu.core import geotiff, loaders


MAPINFO = dict(proj="UTM", xtie=1.0, ytie=1.0, ulx=391000.0, uly=3786000.0,
               xps=3.0, yps=3.0, zone="11", hemi="North", datum="WGS-84",
               rotation=0.0)


def test_geotiff_roundtrip_single_band(tmp_path, rng):
    arr = rng.normal(size=(12, 17)).astype(np.float32)
    p = str(tmp_path / "x.tif")
    geotiff.write_geotiff(p, arr, mapinfo=MAPINFO, nodata=-9999)
    back, meta = geotiff.read_geotiff(p)
    np.testing.assert_array_equal(back, arr)
    assert meta["geotransform"] == (391000.0, 3.0, 0.0, 3786000.0, 0.0, -3.0)
    assert meta["epsg"] == 32611
    assert meta["nodata"] == -9999


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float64])
def test_geotiff_multiband_dtypes(tmp_path, rng, dtype):
    arr = (rng.normal(size=(6, 9, 4)) * 50).astype(dtype)
    p = str(tmp_path / "m.tif")
    geotiff.write_geotiff(p, arr)
    back, meta = geotiff.read_geotiff(p)
    np.testing.assert_array_equal(back, arr)


def test_geotiff_geographic(tmp_path):
    m = dict(proj="Geographic Lat/Lon", ulx=-118.5, uly=34.5, xps=0.001,
             yps=0.001, rotation=0.0)
    p = str(tmp_path / "g.tif")
    geotiff.write_geotiff(p, np.zeros((4, 4), np.float32), mapinfo=m)
    _, meta = geotiff.read_geotiff(p)
    assert meta["epsg"] == 4326


def _write_cmf(tmp_path, rng, name="ang20200924t211102_cmf_v2y1_img"):
    dat = np.zeros((10, 8, 4), np.float32)
    dat[..., :3] = rng.uniform(1, 10, size=(10, 8, 3))
    dat[..., 3] = rng.normal(300, 50, size=(10, 8))
    dat[0, 0] = -9999
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "391000", "3786000", "3.0",
                         "3.0", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"],
            "band names": ["Red", "Green", "Blue", "CH4"]}
    envi_io.save_envi(str(tmp_path / (name + ".hdr")), dat, metadata=meta,
                      interleave="bip")
    return str(tmp_path / name), dat


def test_loadcmf(tmp_path, rng):
    path, dat = _write_cmf(tmp_path, rng)
    cmf, rgb, nodata, imgmap = loaders.loadcmf(path)
    assert cmf.shape == (10, 8)
    assert nodata[0, 0] and not nodata[5, 5]
    assert rgb.shape == (10, 8, 4)
    assert imgmap["zone"] == "11"


def test_loadmaskedimage(tmp_path, rng):
    path, dat = _write_cmf(tmp_path, rng)
    out = loaders.loadmaskedimage(path, rgb_bands=[0, 1, 2])
    assert out["image"].shape == (10, 8)
    assert np.isnan(out["image"][0, 0])
    assert out["rgb"].shape == (10, 8, 3)


def test_load_plumedf_csv(tmp_path):
    df = pd.DataFrame({
        "Line name": ["l1", "l1", "l1"],
        "Candidate ID": ["l1-A", "l1-B", "l1-B"],
        "True_pos/false_pos": ["TP", "FP", "FP"],
        "Plume Latitude (deg)": [34.0, 34.1, 34.1],
        "Plume Longitude (deg)": [-118.0, -118.1, -118.1],
    })
    f = str(tmp_path / "plumes.csv")
    df.to_csv(f, index=False)
    out = loaders.load_plumedf(f, dedupcols=["Line name", "Candidate ID"])
    assert len(out) == 2
    assert list(out["Candidate ID"]) == ["A", "B"]
    assert "Class label" in out.columns
    assert out.iloc[0]["Class label"].endswith("Plume")


def test_parse_masks(tmp_path, rng):
    # mask image: 4 bands, flag set at one location
    mask = np.zeros((20, 20, 4), np.int16)
    mask[10, 10, 2] = 1     # flare at (10, 10)
    meta = {"data ignore value": -9999,
            "band names": ["Cloud mask", "Specular mask", "Flare mask",
                           "Dark mask"],
            "map info": ["UTM", "1", "1", "391000", "3786000", "3.0",
                         "3.0", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"]}
    name = "ang20200924t211102_msk_v2y1_img"
    envi_io.save_envi(str(tmp_path / (name + ".hdr")), mask, metadata=meta,
                      interleave="bil")
    from srcfinder_tpu.core.geo import sl2latlon, mapinfo as mi
    m = mi(meta)
    lat1, lon1 = sl2latlon(10, 10, mapinfo=m)   # on the flare
    lat2, lon2 = sl2latlon(2, 2, mapinfo=m)     # clean
    df, cols = loaders.parse_masks(
        np.array(["ang20200924t211102"] * 2), np.array(["A", "B"]),
        np.array([lat1, lat2]), np.array([lon1, lon2]),
        str(tmp_path), "img")
    assert cols == ["Cloud", "Specular", "Flare", "Dark"]
    a = df[df.cid == "A"].iloc[0]
    b = df[df.cid == "B"].iloc[0]
    assert a["Flare"] == 1 and a["Cloud"] == 0
    assert b[cols].sum() == 0


def test_mask2rgb():
    mask = np.zeros((5, 5, 4), np.int16)
    mask[1, 1, 0] = 1   # cloud
    mask[2, 2, 3] = 1   # dark
    mask[0, 0] = -9999
    rgb = loaders.mask2rgb(mask)
    assert rgb.shape == (5, 5, 4)
    assert rgb[1, 1, 0] == 0.8
    assert (rgb[0, 0] == 0).all()


def test_absnorm_smoothbil(rng):
    img = rng.normal(size=(16, 16)).astype(np.float32)
    mask = np.zeros((16, 16), bool)
    n, imin, imax = loaders.absnorm(img, mask)
    assert n.min() >= 0 and n.max() <= 1
    assert imax == -imin
    sm = loaders.smoothbil(img, mask, 5, 25, 25)
    assert sm.shape == img.shape
    assert np.isfinite(sm).all()


# ------------------------------------------------------------- xlsx
def test_xlsx_roundtrip(tmp_path):
    from srcfinder_tpu.core import xlsx
    rows = [["Candidate ID", "Count", "Frac", "Flag", "Note"],
            ["ang-1", 3, 1.25, True, "a <b> & \"c\""],
            ["ang-2", -7, float("nan"), False, None],
            ["üñïçødé", 0, 2e-5, True, "  leading spaces"]]
    p = str(tmp_path / "t.xlsx")
    xlsx.write_xlsx(p, rows, sheet_name="Plume_List")
    back = xlsx.read_xlsx_rows(p)
    assert back[0] == rows[0]
    assert back[1][:2] == ["ang-1", 3]
    assert back[1][2] == 1.25 and back[1][3] is True
    assert back[1][4] == 'a <b> & "c"'
    assert back[2][2] is None and back[2][4] is None   # NaN/None -> blank
    assert back[3][0] == "üñïçødé"
    assert back[3][4] == "  leading spaces"
    # named-sheet lookup + missing sheet
    assert xlsx.read_xlsx_rows(p, "Plume_List")[0] == rows[0]
    import pytest as _pt
    with _pt.raises(KeyError):
        xlsx.read_xlsx_rows(p, "Nope")


def test_xlsx_shared_strings(tmp_path):
    """Reader handles Excel's sharedStrings encoding (our writer uses
    inline strings; real files from Excel/openpyxl use the string
    table) — crafted here independently."""
    import zipfile
    from srcfinder_tpu.core import xlsx
    p = str(tmp_path / "s.xlsx")
    sheet = ('<?xml version="1.0"?><worksheet xmlns="http://schemas.'
             'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
             '<row r="1"><c r="A1" t="s"><v>0</v></c>'
             '<c r="C1" t="s"><v>1</v></c></row>'
             '<row r="2"><c r="A2"><v>42</v></c>'
             '<c r="B2" t="b"><v>1</v></c>'
             '<c r="C2" t="str"><v>cached</v></c></row>'
             '</sheetData></worksheet>')
    shared = ('<?xml version="1.0"?><sst xmlns="http://schemas.'
              'openxmlformats.org/spreadsheetml/2006/main" count="2" '
              'uniqueCount="2"><si><t>hello</t></si>'
              '<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>')
    wb = ('<?xml version="1.0"?><workbook xmlns="http://schemas.'
          'openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://'
          'schemas.openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
          '</workbook>')
    rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>')
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = xlsx.read_xlsx_rows(p)
    assert rows[0] == ["hello", None, "rich"]
    assert rows[1] == [42, True, "cached"]


def test_xlsx_dataframe_and_plumedf(tmp_path):
    from srcfinder_tpu.core import xlsx
    df = pd.DataFrame({
        "Line name": ["l1", "l1"],
        "Candidate ID": ["l1-A", "l1-B"],
        "True_pos/false_pos": ["TP", "FP"],
        "Plume Latitude (deg)": [34.0, 34.1],
        "Plume Longitude (deg)": [-118.0, -118.1],
    })
    p = str(tmp_path / "plumes.xlsx")
    xlsx.write_xlsx(p, [list(df.columns)] + df.values.tolist())
    back = xlsx.read_xlsx(p)
    assert list(back.columns) == list(df.columns)
    assert back["Plume Latitude (deg)"].tolist() == [34.0, 34.1]
    # the reference reads its plume lists from xlsx
    # (srcfinder_util.py:2042-2081)
    out = loaders.load_plumedf(p)
    assert list(out["Candidate ID"]) == ["A", "B"]
    assert out.iloc[0]["Class label"].endswith("Plume")


# ------------------------------------------------------------- LZW TIFF
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_geotiff_lzw_roundtrip(tmp_path, rng, dtype):
    arr = (rng.normal(size=(37, 23, 3)) * 50).astype(dtype)
    arr[5:20, 4:15] = 7        # compressible region
    p = str(tmp_path / "z.tif")
    geotiff.write_geotiff(p, arr, mapinfo=MAPINFO, nodata=-9999,
                          compress="lzw")
    back, meta = geotiff.read_geotiff(p)
    np.testing.assert_array_equal(back, arr)
    assert meta["nodata"] == -9999


def test_geotiff_lzw_compresses(tmp_path):
    arr = np.zeros((64, 64), np.float32)  # maximally compressible
    p1, p2 = str(tmp_path / "u.tif"), str(tmp_path / "c.tif")
    geotiff.write_geotiff(p1, arr)
    geotiff.write_geotiff(p2, arr, compress="lzw")
    assert os.path.getsize(p2) < os.path.getsize(p1) / 4


def test_geotiff_lzw_external_reader(tmp_path, rng):
    """Our LZW output decodes in an independent reader (PIL/libtiff)."""
    PIL = pytest.importorskip("PIL.Image")
    arr = (rng.normal(size=(21, 33)) * 100).astype(np.float32)
    p = str(tmp_path / "x.tif")
    geotiff.write_geotiff(p, arr, compress="lzw")
    with PIL.open(p) as im:
        ext = np.asarray(im)
    np.testing.assert_array_equal(ext, arr)


def test_geotiff_lzw_external_writer(tmp_path, rng):
    """An LZW file produced by an independent writer (PIL) decodes
    here, including predictor if PIL emits one."""
    PIL = pytest.importorskip("PIL.Image")
    arr = (np.abs(rng.normal(size=(19, 27))) * 60).astype(np.uint8)
    p = str(tmp_path / "ext.tif")
    PIL.fromarray(arr).save(p, format="TIFF", compression="tiff_lzw")
    back, _ = geotiff.read_geotiff(p)
    np.testing.assert_array_equal(back, arr)


def test_retrieve_rgb_injectable_fetcher(tmp_path):
    """retrieve_rgb analog (reference: srcfinder_util.py:1803-1832) with
    an injected fetcher (zero-egress environment)."""
    calls = []

    def fake_fetch(url, dest):
        calls.append(url)
        with open(dest, "wb") as f:
            f.write(b"\x89PNG fake")

    rgbf = str(tmp_path / "ang20200924t211102_RGB.jpeg")
    assert loaders.retrieve_rgb(rgbf, fetcher=fake_fetch) == 0
    assert "y20_RGB" in calls[0] and "avirisng.jpl.nasa.gov" in calls[0]
    # idempotent: present file short-circuits
    assert loaders.retrieve_rgb(rgbf, fetcher=fake_fetch) == 0
    assert len(calls) == 1
    # the 2017 qlook URL scheme
    rgbf17 = str(tmp_path / "ang20170924t211102_RGB.jpeg")
    loaders.retrieve_rgb(rgbf17, fetcher=fake_fetch)
    assert "/ql/17qlook/ang20170924t211102_geo.jpeg" in calls[1]
    # failure path returns nonzero
    def bad_fetch(url, dest):
        raise OSError("no route")
    assert loaders.retrieve_rgb(str(tmp_path / "ang20190101t000000.j"),
                                fetcher=bad_fetch) == 1
    # non-AVIRIS names rejected
    import pytest as _pt
    with _pt.raises(ValueError):
        loaders.retrieve_rgb(str(tmp_path / "foo.jpeg"))


def test_lzw_native_matches_python(rng):
    """The C++ LZW codec (native/enviio.cpp) must be byte-identical to
    the pure-python reference implementation in both directions,
    including table-restart streams (>4k distinct phrases)."""
    from srcfinder_tpu.core.native import HAVE_NATIVE, _native
    from srcfinder_tpu.core.geotiff import _lzw_encode_py, _lzw_decode_py
    if not (HAVE_NATIVE and hasattr(_native, "lzw_encode")):
        pytest.skip("native extension not built")
    cases = [
        b"",
        b"abAB" * 5,
        rng.integers(0, 256, size=200_000).astype(np.uint8).tobytes(),
        (np.arange(120_000) % 251).astype(np.uint8).tobytes(),
        np.zeros(50_000, np.uint8).tobytes(),
    ]
    for data in cases:
        enc_py = _lzw_encode_py(data)
        enc_c = _native.lzw_encode(data)
        assert enc_c == enc_py
        assert _native.lzw_decode(enc_py) == data
        assert _lzw_decode_py(enc_c) == data
    with pytest.raises(ValueError):
        _native.lzw_decode(b"\xff\xff\xff\xff")
