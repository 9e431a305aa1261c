"""GeoTIFF writer/reader and product loaders tests."""

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
