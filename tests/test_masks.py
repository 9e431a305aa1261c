"""Spectrometer mask tests (reference contract:
spectrometer_masks/masks_sds.py)."""

import os

import numpy as np
import pytest

from srcfinder_tpu.masks import (MaskParams, pixel_masks, grow_flare_mask,
                                 dilate_mask, masks_for_cube,
                                 get_radius_in_pixels)


def _small_params():
    # small synthetic cube: 8 bands; wavelengths chosen so bands 5..7 are
    # in the saturation window; cloud bands (0, 1, 2); dark band 3; spec 4
    wl = np.array([450., 670., 1250., 2139., 500., 2000., 2200., 2400.],
                  np.float32)
    params = MaskParams(cld_bands=(0, 1, 2), dark_band=3, spec_band=4)
    return wl, params


def test_pixel_masks(rng):
    wl, params = _small_params()
    block = np.full((4, 5, 8), 1.0, np.float32)
    # saturated pixel: band 6 > 6.0
    block[1, 1, 6] = 7.0
    # specular: saturated AND band4 > 9
    block[2, 2, 6] = 7.0
    block[2, 2, 4] = 10.0
    # dark pixel: band3 < 0.104
    block[3, 3, 3] = 0.05
    # cloud pixel: 450nm > 15 with both slopes negative (450 > 670 > 1250)
    block[0, 4, 0] = 20.0
    block[0, 4, 1] = 5.0
    block[0, 4, 2] = 2.0

    sat, cloud, spec, dark = (np.asarray(m) for m in
                              pixel_masks(block, wl, params))
    assert sat[1, 1] and sat[2, 2] and not sat[0, 0]
    assert spec[2, 2] and not spec[1, 1]
    assert dark[3, 3] and not dark[0, 0]
    assert cloud[0, 4] and not cloud[1, 1]


def test_grow_flare_mask():
    sat = np.zeros((20, 20), bool)
    sat[5:8, 5:8] = True       # 9 px region, grown
    sat[15, 15] = True         # 1 px region, not grown (mingrowarea=5)
    spec = np.zeros_like(sat)
    veto = np.zeros_like(sat)
    out = grow_flare_mask(sat, spec, veto, grow_radius_px=3, mingrowarea=5)
    assert out[6, 6] == 1          # flare core
    assert out[15, 15] == 1        # saturated but ungrown
    assert out[3, 6] == 2          # buffer ring from dilation
    assert out[15, 12] == 0        # no buffer around the small region
    # specular pixels are excluded from the flare class
    spec[6, 6] = True
    out2 = grow_flare_mask(sat, spec, veto, 3, 5)
    assert out2[6, 6] == 2         # buffer covers it, but not flare=1


def test_dilate_mask():
    m = np.zeros((9, 9), bool)
    m[4, 4] = True
    out = dilate_mask(m, 2.0)
    assert out[4, 2] and out[2, 4]
    assert not out[1, 1]  # cross-shaped growth: corner at distance 3+3


def test_get_radius_in_pixels():
    meta = {"map info": ["UTM", "1", "1", "0", "0", "3.0", "3.0", "11",
                         "North", "WGS-84", "units=Meters"]}
    assert get_radius_in_pixels("150m", meta) == 50
    assert get_radius_in_pixels("10px", {}) == 10
    with pytest.raises(RuntimeError):
        get_radius_in_pixels("150m", {})


def test_masks_for_cube_blockwise(rng):
    wl, params = _small_params()
    nrows, ncols = 37, 9
    cube = np.full((nrows, ncols, 8), 1.0, np.float32)
    cube[30, 4, 6] = 7.0          # saturated near a block boundary
    cube[0, 0, 0] = -9999         # nodata corner
    out = masks_for_cube(lambda r0, r1: cube[r0:r1], nrows, ncols, wl,
                         params=params, maskgrowradius_px=2, mingrowarea=1,
                         cldbfr_px=1, block_step=16,
                         nodata_row0=cube[..., 0] == -9999)
    assert out.shape == (nrows, ncols, 4)
    assert out.dtype == np.int16
    assert out[30, 4, 2] == 1       # flare
    assert out[28, 4, 2] == 2       # buffer
    assert (out[0, 0] == -9999).all()


def test_cli_end_to_end(tmp_path, rng):
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.masks import cli

    nrows, ncols, nb = 12, 6, 8
    wl, _ = _small_params()
    cube = np.full((nrows, ncols, nb), 1.0, np.float32)
    cube[4, 3, 6] = 7.0
    name = "ang20200924t211102_rdn_v2x1_img"
    meta = {"wavelength": [str(w) for w in wl],
            "map info": ["UTM", "1", "1", "0", "0", "3.0", "3.0", "11",
                         "North", "WGS-84", "units=Meters"],
            "data ignore value": -9999}
    envi_io.save_envi(str(tmp_path / (name + ".hdr")), cube, metadata=meta,
                      interleave="bil")
    txt = tmp_path / "files.txt"
    txt.write_text(name + "\n")
    outdir = tmp_path / "out"
    os.makedirs(outdir)
    # note: the tiny cube has its "spectral" bands remapped; pass custom
    # thresholds so the defaults (band 352 etc.) are not exercised here
    rc = cli.main(["--txt", str(txt), "--inpath", str(tmp_path) + os.sep,
                   "--outpath", str(outdir) + os.sep,
                   "-M", "2px", "-A", "1", "-B", "1px", "--device", "cpu"])
    # the default MaskParams index bands past nb; the CLI is exercised for
    # plumbing only when it succeeds
    assert rc == 0 or rc is None


def test_mask_output_name():
    from srcfinder_tpu.masks.cli import mask_output_name
    assert (mask_output_name("ang20200924t211102_rdn_v2x1_img")
            == "ang20200924t211102_msk_v2x1_img")


def test_masks_cli_through_object_store(tmp_path, rng):
    """The AWS Batch variant's surface: fetch radiance from an object
    store, process, upload the mask (reference:
    deployment/spectrometer-masks/masks_sds.py:261-330) — exercised with
    the local backend."""
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.flow.objectstore import LocalObjectStore
    from srcfinder_tpu.masks import cli as masks_cli

    L, C, B = 30, 12, 425
    x = np.abs(rng.normal(3.0, 0.5, size=(L, C, B))).astype(np.float32)
    meta = {"data ignore value": -9999,
            "wavelength": list(np.linspace(380, 2500, B)),
            "map info": ["UTM", "1", "1", "272247", "3992010", "5.0",
                         "5.0", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"]}
    staging = tmp_path / "staging"
    name = "ang20200924t211102_rdn_v2y1_img"
    local = tmp_path / "local"
    os.makedirs(local)
    envi_io.save_envi(str(local / (name + ".hdr")), x, metadata=meta,
                      interleave="bil")
    inbucket = LocalObjectStore(str(tmp_path / "in_bucket"))
    inbucket.put(str(local / (name + ".hdr")), name + ".hdr")
    inbucket.put(str(local / name), name)

    txt = tmp_path / "flights.txt"
    txt.write_text(name + "\n")
    outpath = tmp_path / "out"
    os.makedirs(outpath)
    rc = masks_cli.main([
        "--txt", str(txt), "--inpath", str(staging),
        "--outpath", str(outpath),
        "--store-in", str(tmp_path / "in_bucket"),
        "--store-out", str(tmp_path / "out_bucket")])
    assert rc == 0
    outname = name.replace("_rdn_", "_msk_")
    outbucket = LocalObjectStore(str(tmp_path / "out_bucket"))
    assert outbucket.exists(outname + ".hdr")
    assert outbucket.exists(outname)
