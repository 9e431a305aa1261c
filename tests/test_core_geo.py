"""Geodesy tests: UTM round trips against known control points, pixel<->map
transforms with rotation (reference contract: srcfinder_util.py:815-1024)."""

import numpy as np
import pytest

from srcfinder_tpu.core import geo


def test_utm_exact_anchors():
    """Anchors with exactly known values on the WGS-84 UTM grid."""
    # equator on a zone central meridian: easting exactly 500000, northing 0
    e, n, z, _ = geo.latlon2utm(0.0, 3.0)
    assert z == 31
    assert abs(e - 500000.0) < 1e-3
    assert abs(n) < 1e-3
    # the classic (0, 0) point: zone 31N, ~166021.44 E, 0 N
    e, n, z, _ = geo.latlon2utm(0.0, 0.0)
    assert z == 31
    assert abs(e - 166021.44) < 0.5
    assert abs(n) < 1e-3
    # one degree east of a central meridian at the equator:
    # a * 1deg * k0 = 111275.0 m plus small higher-order terms
    e, n, z, _ = geo.latlon2utm(0.0, 4.0)
    assert abs((e - 500000.0) - 111319.49 * 0.9996) < 20.0


@pytest.mark.parametrize("lat,lon", [
    (34.2013, -118.1714),   # JPL, Pasadena CA
    (36.9989, -109.0452),   # Four Corners NM
    (-33.8688, 151.2093),   # Sydney AU (southern hemisphere)
    (31.8, -102.3),         # Permian basin
])
def test_latlon2utm_roundtrip(lat, lon):
    easting, northing, z, letter = geo.latlon2utm(lat, lon)
    if lat < 0:
        assert northing > 0  # false northing applied
    lat2, lon2 = geo.utm2latlon(easting, northing, z,
                                hemi="North" if lat >= 0 else "South")
    assert abs(lat2 - lat) < 1e-6
    assert abs(lon2 - lon) < 1e-6


def test_latlon2utm_vectorized():
    lats = np.array([34.2013, 36.9989])
    lons = np.array([-118.1714, -109.0452])
    e, n, z, h = geo.latlon2utm(lats, lons)
    assert e.shape == (2,)
    assert z.tolist() == [11, 12]
    e0, n0, _, _ = geo.latlon2utm(34.2013, -118.1714)
    assert abs(e[0] - e0) < 1e-9 and abs(n[0] - n0) < 1e-9


def test_sl2xy_no_rotation():
    m = dict(ulx=1000.0, uly=5000.0, xps=2.0, yps=2.0, rotation=0.0)
    x, y = geo.sl2xy(10, 20, mapinfo=m)
    assert (x, y) == (1020.0, 4960.0)
    s, l = geo.xy2sl(x, y, mapinfo=m)
    assert np.allclose([s, l], [10, 20])


def test_sl2xy_rotation_roundtrip():
    m = dict(ulx=272247.152557, uly=3992010.65018, xps=3.1, yps=3.1,
             rotation=17.0)
    # xy2sl's y-axis flip before rotation makes the same-sign rotation the
    # exact inverse of sl2xy (matches the reference pair,
    # srcfinder_util.py:815-920)
    for s0, l0 in [(0, 0), (100, 50), (668, 2800)]:
        x, y = geo.sl2xy(s0, l0, mapinfo=m)
        s1, l1 = geo.xy2sl(x, y, mapinfo=m)
        assert np.allclose([s1, l1], [s0, l0], atol=1e-9)


def test_mapinfo_parse_and_format():
    maplist = ["UTM", "1", "1", "272247.152557", "3992010.65018", "3.1",
               "3.1", "11", "North", "WGS-84", "units=Meters",
               "rotation=17.0000000"]
    meta = {"map info": maplist}
    m = geo.mapinfo(meta)
    assert m["proj"] == "UTM"
    assert m["ulx"] == 272247.152557
    assert m["zone"] == "11"
    assert m["hemi"] == "North"
    assert m["rotation"] == 17.0
    s = geo.mapdict2str(m)
    assert s.startswith("{ UTM, 1.0, 1.0, 272247.152557")
    assert "rotation=17.0" in s


def test_sl2latlon_utm():
    m = geo.mapinfo({"map info": ["UTM", "1", "1", "391000", "3786000",
                                  "3.0", "3.0", "11", "North", "WGS-84",
                                  "units=Meters", "rotation=0"]})
    lat, lon = geo.sl2latlon(0, 0, mapinfo=m)
    # inverse: map coords back
    e, n, z, _ = geo.latlon2utm(lat, lon, zone=11)
    assert abs(e - 391000) < 0.5
    assert abs(n - 3786000) < 0.5
    s, l = geo.latlon2sl(lat, lon, mapinfo=m)
    assert abs(s) < 0.2 and abs(l) < 0.2


def test_gcdist():
    # one degree of latitude at the equator ~ 111.19 km for sphere R=6371km
    d = geo.gcdist(0.0, 0.0, 0.0, 1.0)
    assert abs(d - 111194.9) < 100
    assert geo.gcdist(10.0, 20.0, 10.0, 20.0) == 0.0


def test_zone_epsg_helpers():
    assert geo.utmzone2epsg(11, "N") == 32611
    assert geo.utmzone2epsg(33, "S") == 32733
    assert geo.epsg2utmzone(32611) == (11, "N")
    assert geo.geo2utmzone(-118.17, 34.2) == (11, "N")


def test_warp_north_up(rng):
    """North-up warp of a rotated raster (reference shells gdalwarp,
    posthoc_down.py:50-60): every output pixel's map coordinate must
    inverse-map to the source pixel whose value it carries."""
    from srcfinder_tpu.core.warp import warp_north_up
    from srcfinder_tpu.core.geo import xy2sl

    h, w = 24, 16
    data = np.arange(h * w, dtype=np.float32).reshape(h, w)
    m = dict(proj="UTM", xtie=1.0, ytie=1.0, ulx=391000.0, uly=3786000.0,
             xps=3.0, yps=3.0, zone="11", hemi="North", rotation=17.0)
    out, m2 = warp_north_up(data, m, nodata=-9999.0)
    assert m2["rotation"] == 0.0
    assert out.shape[0] >= h and out.shape[1] >= w   # bbox grows
    valid = out != -9999.0
    assert valid.sum() > 0.6 * h * w                 # most pixels carried
    # verify a handful of output pixels against the inverse transform
    ys, xs = np.where(valid)
    for i in range(0, len(ys), max(1, len(ys) // 10)):
        yy, xx = ys[i], xs[i]
        mx = m2["ulx"] + m2["xps"] * xx
        my = m2["uly"] - m2["yps"] * yy
        s, l = xy2sl(mx, my, mapinfo=m)
        si, li = int(round(float(s))), int(round(float(l)))
        assert out[yy, xx] == data[li, si]
    # rotation 0 is a no-op
    m0 = dict(m, rotation=0.0)
    same, m3 = warp_north_up(data, m0)
    assert same is data and m3 is m0
