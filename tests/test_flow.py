"""Flow-layer tests: wind grids + GRIB2 decode, distances, wind stats,
time bucketing, emissions, clustering, dedup, persistence, inversion,
harvester, dir watcher, job queue, and the msf_flow orchestrator e2e."""

import datetime as dt
import json
import os
import struct
import time

import numpy as np
import pandas as pd
import pytest

from srcfinder_tpu import flow


# ---------------------------------------------------------------- helpers
def make_grid(rng, ny=8, nx=10, u0=3.0, v0=4.0,
              date=dt.datetime(2020, 9, 24, 21, 0)):
    lat = np.linspace(34.0, 35.0, ny)[:, None] * np.ones((1, nx))
    lon = np.linspace(-119.0, -118.0, nx)[None, :] * np.ones((ny, 1))
    u = np.full((ny, nx), u0) + rng.normal(0, 0.1, (ny, nx))
    v = np.full((ny, nx), v0) + rng.normal(0, 0.1, (ny, nx))
    gust = np.abs(u) + 1
    return flow.WindGrid(lat, lon, u, v, gust, date)


def write_grid(tmp_path, name, grid, alt=10):
    path = str(tmp_path / name)
    flow.write_wind_grid_npz(path, grid, alt=alt)
    return path + ".npz" if not path.endswith(".npz") else path


# ------------------------------------------------------------------ tests
def test_npz_roundtrip(tmp_path, rng):
    g = make_grid(rng)
    p = str(tmp_path / "w.npz")
    flow.write_wind_grid_npz(p, g)
    back = flow.read_wind_grid(p)
    np.testing.assert_allclose(back.u, g.u)
    assert back.valid_date == g.valid_date
    with pytest.raises(ValueError):
        flow.read_wind_grid(p, alt=50)


def _encode_grib2_simple(path, grid):
    """Tiny GRIB2 writer (template 3.0 + 5.0) for decoder testing."""
    ny, nx = grid.u.shape

    def section(num, body):
        length = 4 + 1 + len(body)
        return struct.pack(">IB", length, num) + body

    def field_sections(number, values):
        vals = values.ravel()
        vmin = float(vals.min())
        scaled = np.round((vals - vmin)).astype(np.int64)
        nbits = max(int(scaled.max()).bit_length(), 1)
        # sec4: product definition (template 4.0)
        body4 = bytearray(30)
        body4[0:4] = struct.pack(">I", 0)  # placeholder, fixed later
        sec4 = bytearray(struct.pack(">IBHH", 34, 4, 0, 0))
        sec4 += bytes([0, 2, number]) + bytes(22)
        sec4[0:4] = struct.pack(">I", len(sec4))
        # offsets: body[9]=category, body[10]=number -> indices 9,10 of FULL
        sec4 = bytearray(sec4)
        sec4[9] = 2          # category
        sec4[10] = number
        sec4[22] = 103       # fixed surface type
        # sec5: simple packing R=vmin, E=0, D=0
        sec5 = (struct.pack(">IBIH", 21, 5, len(vals), 0)
                + struct.pack(">fhhBB", vmin, 0, 0, nbits, 0))
        # sec6: no bitmap
        sec6 = struct.pack(">IBB", 6, 6, 255)
        # sec7: packed data
        bits = np.unpackbits(
            scaled.astype(">u8").view(np.uint8).reshape(-1, 8),
            axis=1)[:, -nbits:].ravel()
        pad = (-len(bits)) % 8
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        data = np.packbits(bits).tobytes()
        sec7 = struct.pack(">IB", 5 + len(data), 7) + data
        return bytes(sec4) + sec5 + sec6 + sec7

    # sec1: identification
    d = grid.valid_date
    sec1 = (struct.pack(">IB", 21, 1) + bytes(7)
            + struct.pack(">H5B", d.year, d.month, d.day, d.hour, d.minute,
                          d.second) + bytes(2))
    # sec3: grid definition template 3.0
    body3 = bytearray(72 - 5)
    sec3 = bytearray(struct.pack(">IB", 72, 3))
    sec3 += bytes(72 - 5)
    sec3[12:14] = struct.pack(">H", 0)
    sec3[30:34] = struct.pack(">I", nx)
    sec3[34:38] = struct.pack(">I", ny)
    sec3[46:50] = struct.pack(">i", int(grid.lat[0, 0] * 1e6))
    sec3[50:54] = struct.pack(">i", int(grid.lon[0, 0] * 1e6))
    sec3[55:59] = struct.pack(">i", int(grid.lat[-1, 0] * 1e6))
    sec3[59:63] = struct.pack(">i", int(grid.lon[0, -1] * 1e6))

    payload = (sec1 + bytes(sec3)
               + field_sections(2, grid.u)
               + field_sections(3, grid.v)
               + field_sections(22, grid.gust)
               + b"7777")
    total = 16 + len(payload)
    msg = (b"GRIB" + bytes([0, 0, 0, 2]) + struct.pack(">Q", total)
           + payload)
    with open(path, "wb") as f:
        f.write(msg)


def test_grib2_simple_decode(tmp_path, rng):
    g = make_grid(rng, u0=5.0, v0=2.0)
    # integer-valued fields so simple packing with E=D=0 is lossless
    g = flow.WindGrid(g.lat, g.lon, np.round(g.u * 10) / 10 * 0 + 5.0,
                      np.round(g.v) * 0 + 2.0, g.gust * 0 + 7.0,
                      g.valid_date)
    p = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    _encode_grib2_simple(p, g)
    back = flow.read_grib2_simple(p)
    np.testing.assert_allclose(back.u, g.u)
    np.testing.assert_allclose(back.v, g.v)
    np.testing.assert_allclose(back.gust, g.gust)
    assert back.valid_date == g.valid_date
    np.testing.assert_allclose(back.lat[0, 0], g.lat[0, 0], atol=1e-5)


def test_distance_spherical_matches_reference_example():
    # reference docstring example (windspeed.py:35-41), euclid
    x = [[0, 0], [5, 0], [5, 5]]
    y = [[1, 1], [5, 5]]
    h = flow.distance_spherical(x, y, "euclid")
    np.testing.assert_allclose(
        h, [[1.4142, 7.0711], [4.1231, 5.0], [5.6569, 0]], atol=1e-4)


def test_distance_haversine_vs_gcdist():
    from srcfinder_tpu.core.geo import gcdist
    h = flow.distance_spherical([[-118.0, 34.0]], [[-118.5, 34.5]],
                                "haversine")
    ref_m = gcdist(-118.0, 34.0, -118.5, 34.5)
    assert abs(h[0, 0] * 1000 - ref_m) / ref_m < 2e-3  # radius convention


def test_distance_index():
    x = [[-118.0, 34.0]]
    y = [[-118.0, 34.0], [-118.5, 34.5], [-117.0, 33.0]]
    idx, d, table = flow.distance_index(x, y, "min", "spherical")
    assert idx == 0 and d < 1e-3
    assert table.shape == (3, 2)
    idx2, d2, _ = flow.distance_index(x, y, "max", "spherical")
    assert idx2 == 2


def test_wind_mnstd_cases(tmp_path, rng):
    g1 = make_grid(rng, u0=3.0, v0=4.0)   # speed ~5
    g2 = make_grid(rng, u0=6.0, v0=8.0)   # speed ~10
    p1 = write_grid(tmp_path, "w1.npz", g1)
    p2 = write_grid(tmp_path, "w2.npz", g2)
    loc = (-118.5, 34.5)
    # case 3: npoints>1, 1 file
    mean, std, mnidx, mndist, per_file, dates = flow.wind_mnstd(
        4, loc, [p1])
    assert abs(mean - 5.0) < 0.3
    assert std >= 0 and mndist < 20
    # case 1: npoints=1, 1 file -> std exactly 0
    _, std1, _, _, _, _ = flow.wind_mnstd(1, loc, [p1])
    assert std1 == 0
    # case 4: npoints>1, >1 files: mean over both grids
    mean4, std4, _, _, per_file4, _ = flow.wind_mnstd(4, loc, [p1, p2])
    assert abs(mean4 - 7.5) < 0.5
    assert per_file4.shape == (2, 2)
    assert dates[0][1][0] == 2020


def test_nearst_hm():
    hr, mn = flow.nearst_hm("20200924t211059".replace("t", ""), 1, -1,
                            "numericstring")
    assert mn == []
    assert hr == ["202009242000", "202009242200", "202009242100"]
    hr0, mn0 = flow.nearst_hm("20200924211059", -1, 0, "numericstring")
    assert hr0 == []
    assert mn0 == ["202009242115"]  # 21:10:59 rounds to 21:15
    _, mn1 = flow.nearst_hm("20200924211059", -1, 1, "numericstring")
    assert mn1 == ["202009242100", "202009242130", "202009242115"]
    # utcstring format
    hr2, _ = flow.nearst_hm("9/24/2020 21:10:59 UTC", 0, -1, "utcstring")
    assert hr2 == ["202009242100"]


def test_wind_type():
    wt = flow.WindType("/data/winds/hrrr")
    assert wt.is_hrrr() and wt.altitudes() == [10, 80]
    wt2 = flow.WindType("rtma")
    assert wt2.is_rtma() and wt2.altitudes() == [10]
    assert flow.WindType("foo").type_as_str() == "UNKNOWN"


def test_compute_wind_stats_and_emission(tmp_path, rng):
    # lay out hrrr files for the 3 bracketing hours
    winds = tmp_path / "winds" / "hrrr"
    for hh, speed in [("20", (3.0, 4.0)), ("21", (3.0, 4.0)),
                      ("22", (3.0, 4.0))]:
        d = winds / "20200924"
        os.makedirs(d, exist_ok=True)
        g = make_grid(rng, u0=speed[0], v0=speed[1])
        flow.write_wind_grid_npz(
            str(d / f"hrrr.20200924{hh}.wrfsfcf00.npz"), g)

    plume = {
        "Candidate ID": "ang20200924t211102-1",
        "Plume Latitude (deg)": "34.5",
        "Plume Longitude (deg)": "-118.5",
        "AvgIMEdivFetch20 (kg/m)": "0.02",
        "StdIMEdivFetch20 (kg/m)": "0.004",
        "Aspect ratio20": "0.5",
    }
    stats = flow.compute_wind_stats(plume, str(winds), ext=".npz")
    mean_key = flow.get_mean_wind_key("HRRR", 10, 10, 3)
    assert mean_key in stats
    assert abs(stats[mean_key] - 5.0) < 0.5
    plume.update(stats)

    em = flow.compute_emission_rate(plume, "HRRR")
    er_key = "Emission Rate (kg/hr) [HRRR 10 m]"
    assert abs(em[er_key] - 0.02 * stats[mean_key] * 3600) < 1e-9
    assert em["Aspect Ratio Flag (0=valid, 1=invalid)"] == 0
    assert em["Emission Uncertainty (kg/hr) [HRRR 10 m]"] > 0
    # invalid aspect ratio flags
    plume2 = dict(plume, **{"Aspect ratio20": "1.5"})
    em2 = flow.compute_emission_rate(plume2, "HRRR")
    assert em2["Aspect Ratio Flag (0=valid, 1=invalid)"] == 1


def test_cluster(rng):
    pts = np.array([[0, 0], [10, 0], [1000, 1000], [12, 3], [1002, 998]])
    mapping, clusters = flow.cluster(pts, radius=100)
    assert mapping[0] == mapping[1] == mapping[3] == "A00000001"
    assert mapping[2] == mapping[4] == "A00000002"
    assert len(clusters) == 2


def test_cluster_plume_list(tmp_path):
    rows = [
        {"Candidate ID": "c1", "Plume Latitude (deg)": "34.0",
         "Plume Longitude (deg)": "-118.0"},
        {"Candidate ID": "c2", "Plume Latitude (deg)": "34.0001",
         "Plume Longitude (deg)": "-118.0001"},
        {"Candidate ID": "c3", "Plume Latitude (deg)": "35.0",
         "Plume Longitude (deg)": "-117.0"},
        {"Candidate ID": "c4", "Plume Latitude (deg)": "-9999",
         "Plume Longitude (deg)": "-9999"},
    ]
    inp = tmp_path / "p.csv"
    pd.DataFrame(rows).to_csv(inp, index=False)
    out = flow.cluster_plume_list(str(inp), str(tmp_path / "o.csv"),
                                  radius=150)
    assert len(out) == 3  # fill row dropped
    assert out[0]["Source ID"] == out[1]["Source ID"]
    assert out[2]["Source ID"] != out[0]["Source ID"]


def test_teale_albers_sanity():
    # EPSG:3310 well-known anchor: the projection origin (-120, 0) maps to
    # (0, -4000000)
    x, y = flow.teale_albers(0.0, -120.0)
    assert abs(x - 0) < 1e-6
    assert abs(y - (-4000000.0)) < 1e-6
    # 150 m apart stays ~150 m in an equal-area projection at CA latitudes
    x1, y1 = flow.teale_albers(36.0, -120.0)
    x2, y2 = flow.teale_albers(36.0 + 150 / 111320.0 / np.cos(0), -120.0)
    d = np.hypot(x2 - x1, y2 - y1)
    assert abs(d - 150 * 1.0) < 2.0


def test_circle_overlap():
    assert flow.circle_overlap_fraction(0.0) == pytest.approx(1.0)
    assert flow.circle_overlap_fraction(300.0) == 0.0
    assert flow.circle_overlap_fraction(400.0) == 0.0
    half = flow.circle_overlap_fraction(150.0)
    assert 0.3 < half < 0.5  # lens fraction at d=r is ~0.391


def test_remove_duplicate_plumes():
    df = pd.DataFrame({
        "Line name": ["l1"] * 3 + ["l2"],
        "Candidate ID": ["ang-01", "ang-02", "ang-03", "ang-04"],
        "Source ID": ["S1", "S2", "S3", "S4"],
        "Plume Latitude (deg)": [36.0, 36.0001, 36.5, 36.0],
        "Plume Longitude (deg)": [-120.0, -120.0001, -120.5, -120.0],
        "Emission Rate (kg/hr) [HRRR 10 m]": [100.0, 50.0, 70.0, 30.0],
    })
    out = flow.remove_duplicate_plumes(df)
    # plumes 0/1 overlap (same spot): lower-flux one dropped;
    # plume 2 far away kept; plume 3 is a different line group
    cids = set(out["Candidate ID"])
    assert "ang-01" in cids
    assert "ang-02" not in cids
    assert "ang-03" in cids
    assert "ang-04" in cids


def test_point_in_polygon_and_persistence(tmp_path):
    square = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                       float)]
    assert flow.point_in_polygon(5, 5, square)
    assert not flow.point_in_polygon(15, 5, square)
    # polygon with a hole
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    assert not flow.point_in_polygon(5, 5, [square[0], hole])

    df = pd.DataFrame({
        "Source identifier": ["A1", "A1", "A2", "A3"],
        "Plume Latitude (deg)": [5.0, 5.0, 5.0, 50.0],
        "Plume Longitude (deg)": [5.0, 5.0, 9.0, 50.0],
    })
    out = flow.source_persistence(df, ["fl1", "fl2"],
                                  [square, square])
    out = out.set_index("Source identifier")
    assert out.loc["A1", "observed.plumes"] == 2
    assert out.loc["A1", "total.overflights"] == 2
    assert out.loc["A1", "source.Persistence"] == 1.0
    assert np.isnan(out.loc["A3", "source.Persistence"])


def test_shapefile_reader(tmp_path):
    """Write a minimal polygon shapefile by hand and read it back."""
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    content = (struct.pack("<i", 5)
               + struct.pack("<4d", 0, 0, 10, 10)
               + struct.pack("<ii", 1, len(pts))
               + struct.pack("<i", 0)
               + pts.astype("<f8").tobytes())
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    flen = (100 + len(rec)) // 2
    header = (struct.pack(">i", 9994) + bytes(20) + struct.pack(">i", flen)
              + struct.pack("<ii", 1000, 5) + struct.pack("<8d", 0, 0, 10,
                                                          10, 0, 0, 0, 0))
    shp = tmp_path / "fl.shp"
    shp.write_bytes(header + rec)
    polys = flow.read_shapefile_polygons(str(shp))
    assert len(polys) == 1
    np.testing.assert_allclose(polys[0][0], pts)


def test_inversion(rng):
    import jax
    n, m = 50, 4
    H = np.abs(rng.normal(size=(n, m)))
    x_true = np.array([10.0, 0.0, 5.0, 2.0])
    y = H @ x_true + 1860.0
    x_hat = np.asarray(flow.ols_inversion(H, y))
    np.testing.assert_allclose(x_hat, x_true, atol=1e-3)

    x_a = np.zeros(m)
    # weak prior, small obs noise -> near the OLS solution (kept
    # moderate: f32 Cholesky of the 50x50 K matrix)
    S_a = np.eye(m) * 1e2
    S_o = np.eye(n) * 1e-2
    x_b = np.asarray(flow.bayesian_inversion(H, y - 1860.0, x_a, S_a, S_o))
    np.testing.assert_allclose(x_b, x_true, atol=0.1)

    bg = flow.background_percentile([1.0, 2.0, 100.0, 3.0],
                                    ["t1", "t1", "t1", "t2"], q=5.0)
    assert bg["t2"] == 3.0
    assert bg["t1"] < 2.0


def test_harvester(tmp_path):
    conf = {"url_template": "http://example.com/%Y%m%d/file_%H.grib2",
            "local_path_template": "%Y%m%d/file_%H.grib2",
            "time_res": "1h"}
    s, e = flow.set_date_range({"start_date": "20200924",
                                "num_days": 1})
    assert s.day == 24 and e.day == 24 and e.hour == 23
    with pytest.raises(ValueError):
        flow.set_date_range({"start_date": "20200925",
                             "end_date": "20200924"})
    paths = list(flow.paths_generator(s, e, str(tmp_path), conf))
    assert len(paths) == 24
    assert paths[0][0] == "http://example.com/20200924/file_00.grib2"

    fetched = []

    def fake_fetch(url, local):
        fetched.append(url)
        with open(local, "w") as f:
            f.write("x")

    done, failed = flow.harvest_date_range(s, s.replace(hour=3),
                                           str(tmp_path), conf,
                                           fetcher=fake_fetch)
    assert len(done) == 4 and not failed
    # idempotent skip on re-run
    done2, _ = flow.harvest_date_range(s, s.replace(hour=3), str(tmp_path),
                                       conf, fetcher=fake_fetch)
    assert done2 == []

    jobs = flow.invoke_harvester_windows(dt.date(2020, 9, 24))
    hrrr_jobs = [j for j in jobs if j[0] == "hrrr"]
    rtma_jobs = [j for j in jobs if j[0] == "rtma"]
    assert len(hrrr_jobs) == 6 and len(rtma_jobs) == 24


def test_wind_quality_check(tmp_path, rng):
    g = make_grid(rng)
    p = write_grid(tmp_path, "ok.npz", g)
    assert flow.wind_quality_check(p)
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not a npz")
    alerts = []
    assert not flow.wind_quality_check(str(bad),
                                       alert=lambda s, m: alerts.append(s))
    assert alerts


def test_dir_watcher(tmp_path):
    d = tmp_path / "watch"
    os.makedirs(d)
    w = flow.DirWatcher(str(d), force=True, regex=r".*\.csv$")
    (d / "a.csv").write_text("x")
    (d / "b.txt").write_text("x")
    new = w.whats_new_local()
    assert len(new) == 1 and new[0].endswith("a.csv")
    # the cursor is the previous watcher's construction time, so a second
    # run still sees the file (it appeared after w was constructed); the
    # cursor file has 1-second resolution, so wait out the boundary
    time.sleep(1.1)
    w2 = flow.DirWatcher(str(d), regex=r".*\.csv$")
    assert len(w2.whats_new_local()) == 1
    # ...and a third run (cursor = w2's construction) sees nothing new
    w3 = flow.DirWatcher(str(d), regex=r".*\.csv$")
    assert w3.whats_new_local() == []


def test_station_data_with_fake_fetch():
    plume = {"Candidate ID": "ang20200924t211102-1",
             "Plume Latitude (deg)": "34.5",
             "Plume Longitude (deg)": "-118.5"}

    def fetch(url):
        return {"STATION": [
            {"LONGITUDE": "-118.6", "LATITUDE": "34.5",
             "OBSERVATIONS": {"wind_speed_set_1": [2.0, 4.0]}},
            {"LONGITUDE": "-120.0", "LATITUDE": "36.0",
             "OBSERVATIONS": {"wind_speed_set_1": [9.0]}},
        ]}

    out = flow.get_station_data_for_plume(plume, fetch=fetch)
    assert out["Station wind speed (m/s)"] == 3.0
    assert out["Distance from station (km)"] < 12
    # failure path -> NA fill
    out2 = flow.get_station_data_for_plume(
        plume, fetch=lambda url: (_ for _ in ()).throw(IOError()))
    assert out2["Station wind speed (m/s)"] == "NA"


def test_job_queue(tmp_path):
    q = flow.JobQueue()
    q.register("ime", lambda p: p["PPMMTHR"])
    q.submit(flow.Job("ime", dict(flow.IME_JOB_DEFAULTS)))
    assert q.results[0][1] == 1500
    with pytest.raises(KeyError):
        q.submit(flow.Job("nope", {}))
    q.register("fail", lambda p: 1 / 0)
    q.submit(flow.Job("fail", {}))
    assert len(q.failures) == 1

    d = tmp_path / "events"
    os.makedirs(d)
    (d / "x_plumes.csv").write_text("a\n")
    jobs = flow.watch_and_trigger(str(d), "ime2", _register(q),
                                  regex=r".*\.csv$", force=True)
    assert len(jobs) == 1


def _register(q):
    q.register("ime2", lambda p: p["path"])
    return q


def test_job_specs(tmp_path):
    """deployment/jobs.json drives the queue: templates render with
    submit-time params overriding the job definition's defaults (Batch
    `parameters` semantics, deployment/compute-ime/invoke-ime:21-33)."""
    from srcfinder_tpu.flow.deploy import (load_job_specs, render_command,
                                           register_job_specs, Job,
                                           JobQueue)
    import srcfinder_tpu

    specs_path = os.path.join(os.path.dirname(srcfinder_tpu.__file__),
                              "..", "deployment", "jobs.json")
    specs = load_job_specs(specs_path)
    assert "compute-ime" in specs and "msf-flow" in specs
    # the standalone worker jobs the reference deploys as Lambdas/Batch
    for job in ("wind-quality-check", "wind-bands-nc", "cluster-incr-nn",
                "filter-plumes", "source-persistence", "inversion-run"):
        assert job in specs, job
        assert specs[job]["trigger"]["opt_in"]
    argv = render_command(specs["inversion-run"],
                          {"GRID_DIR": "/g/trop_meta.csv"})
    assert argv == ["srcfinder-inversion", "/g/trop_meta.csv"]

    argv = render_command(specs["compute-ime"], {"CMF_IMG": "/d/x_cmf_img"})
    assert argv[0] == "srcfinder-ime" and "/d/x_cmf_img" in argv
    assert "1500" in argv and "10 20 50" in argv        # defaults applied
    argv2 = render_command(specs["compute-ime"],
                           {"CMF_IMG": "/d/x", "PPMMTHR": 1000})
    assert "1000" in argv2 and "1500" not in argv2      # override wins

    ran = []
    q = JobQueue()
    register_job_specs(q, specs, runner=ran.append)
    q.submit(Job("msf-flow", {"PLUME_LIST": "p.csv", "WIND_DIR": "w",
                              "OUTFILE": "o.csv"}))
    assert ran == [["srcfinder-msf-flow", "--flmode", "p.csv",
                    "-w", "w", "-o", "o.csv"]]
    # a missing required placeholder is a hard error, not a silent blank
    with pytest.raises(KeyError):
        render_command(specs["msf-flow"], {})


def test_ime_cli(tmp_path, rng):
    """srcfinder-ime over a synthetic CMF: plume rows + summary CSV."""
    from srcfinder_tpu.flow import ime_worker
    from srcfinder_tpu.core.envi import save_envi

    cmf = np.zeros((40, 30, 4), np.float32)
    cmf[..., :3] = 5.0
    cmf[10:16, 8:12, 3] = 2000.0                 # one strong plume
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "272247.15", "3992010.65",
                         "3.1", "3.1", "11", "North", "WGS-84",
                         "units=Meters", "rotation=0"]}
    p = str(tmp_path / "ang_test_cmf_img.hdr")
    save_envi(p, cmf, metadata=meta, interleave="bip")
    out = str(tmp_path / "ime.csv")
    ime_worker.main([p, "-o", out, "--ppmmthr", "1500",
                     "--mergedists", "10 20"])
    df = pd.read_csv(out)
    assert len(df) == 2                          # one plume x two dists
    assert (df.ime_kg > 0).all()
    assert set(df.mergedist_m) == {10.0, 20.0}


def test_run_jobs_once_fresh_dir_sees_backlog(tmp_path):
    """srcfinder-jobs --once in a FRESH watch directory (no
    .last_run_time cursor yet) must process the pre-existing backlog
    without --force: DirWatcher alone would initialize its cursor to
    now and skip it (ADVICE r2)."""
    from srcfinder_tpu.flow.deploy import load_job_specs, run_jobs
    import srcfinder_tpu

    specs = load_job_specs(os.path.join(
        os.path.dirname(srcfinder_tpu.__file__), "..", "deployment",
        "jobs.json"))
    d = tmp_path / "incoming"
    os.makedirs(d)
    (d / "ang1_cmf_v2_img").write_text("x")
    # the cursor file stores whole seconds (reference format %H:%M:%S);
    # backdate the backlog so the second run is not a same-second tie
    past = time.time() - 10
    os.utime(d / "ang1_cmf_v2_img", (past, past))

    ran = []
    extra = {"WEIGHTS": "w.npz", "OUTDIR": "o", "LIBRARY": "lib.txt"}
    q, jobs = run_jobs(specs, str(d), extra_params=extra, once=True,
                       force=False, runner=ran.append,
                       explicit_jobs={"compute-ime"})
    assert sorted(j.job_type for j in jobs) == ["compute-ime"]

    # second run with the cursor now present: the old file is not re-seen
    q2, jobs2 = run_jobs(specs, str(d), extra_params=extra, once=True,
                         force=False, runner=ran.append,
                         explicit_jobs={"compute-ime"})
    assert jobs2 == []


def test_run_jobs_event_fanout(tmp_path):
    """srcfinder-jobs: one event stream, per-job regex filters — a CMF
    product triggers BOTH fcn-pred and compute-ime (with extra params
    filled in), a plume list triggers msf-flow, and an unmatched file
    triggers nothing."""
    from srcfinder_tpu.flow.deploy import load_job_specs, run_jobs
    import srcfinder_tpu

    specs = load_job_specs(os.path.join(
        os.path.dirname(srcfinder_tpu.__file__), "..", "deployment",
        "jobs.json"))
    d = tmp_path / "incoming"
    os.makedirs(d)
    (d / "ang1_cmf_v2_img").write_text("x")
    (d / "ang1_plumes_minppmm500.csv").write_text("x")
    (d / "README.txt").write_text("x")

    ran = []
    extra = {"MODEL": "multi_64", "WEIGHTS": "w.npz", "OUTDIR": "o",
             "WIND_DIR": "w", "OUTFILE": "out.csv", "LIBRARY": "lib.txt"}
    # per-stage jobs are opt_in (flightline-pipeline covers their work);
    # enabling them explicitly turns their triggers on
    enabled = {"compute-ime", "fcn-pred", "msf-flow"}
    q, jobs = run_jobs(specs, str(d), extra_params=extra,
                       once=True, force=True, runner=ran.append,
                       explicit_jobs=enabled)
    names = sorted(j.job_type for j in jobs)
    assert names == ["compute-ime", "fcn-pred", "msf-flow"]
    assert not q.failures
    ime_argv = next(a for a in ran if a[0] == "srcfinder-ime")
    assert any("ang1_cmf_v2_img" in s for s in ime_argv)
    assert "1500" in ime_argv                  # job-definition default

    # without explicit enabling, only default triggers fire (none of the
    # dropped files is a radiance, so nothing runs)
    q2, jobs2 = run_jobs(specs, str(d), extra_params=extra,
                         once=True, force=True, runner=ran.append)
    assert jobs2 == []

    # fail fast: a triggered job missing a --set param its command
    # template needs (derived from the template, not a hand list)
    # refuses to start instead of failing per-event at render time
    with pytest.raises(ValueError, match="WIND_DIR"):
        run_jobs(specs, str(d),
                 extra_params={k: v for k, v in extra.items()
                               if k != "WIND_DIR"},
                 once=True, force=True, runner=ran.append,
                 explicit_jobs=enabled)


def test_jobs_cli(tmp_path):
    """srcfinder-jobs CLI end-to-end with a trivially-runnable spec."""
    from srcfinder_tpu.flow import deploy

    spec = {"echo": {"command": ["python", "-c",
                                 "import sys; sys.exit(0)", "{path}"],
                     "trigger": {"regex": r".*\.dat$", "param": "path"}}}
    sf = tmp_path / "jobs.json"
    sf.write_text(json.dumps(spec))
    d = tmp_path / "in"
    os.makedirs(d)
    (d / "a.dat").write_text("1")
    rc = deploy.main([str(sf), "--watch", str(d), "--once", "--force"])
    assert rc == 0


def test_merge_ime_into_plumelist():
    """Per-candidate IME-column attach: proximity match; the *20 columns
    come from the 20 m merge-distance rows ONLY (the reference's column
    suffix denotes that merge distance — mixing 10/50 m rows would bias
    the emission rate); far candidates stay NaN (emission reports NA)."""
    from srcfinder_tpu.flow.ime_worker import merge_ime_into_plumelist

    ime = pd.DataFrame([
        dict(mergedist_m=10, ime_div_fetch=0.4, aspect=0.5,
             lat=36.0, lon=-119.5),      # 10 m row must NOT pollute *20
        dict(mergedist_m=20, ime_div_fetch=0.6, aspect=0.7,
             lat=36.0002, lon=-119.5),
        dict(mergedist_m=20, ime_div_fetch=0.8, aspect=0.3,
             lat=36.0003, lon=-119.5),   # second 20 m row, farther away
        dict(mergedist_m=20, ime_div_fetch=9.9, aspect=0.1,
             lat=37.5, lon=-118.0),      # a different, far-away plume
    ])
    plumes = pd.DataFrame([
        {"Candidate ID": "c1", "Plume Latitude (deg)": 36.0001,
         "Plume Longitude (deg)": -119.5},
        {"Candidate ID": "c2", "Plume Latitude (deg)": 40.0,
         "Plume Longitude (deg)": -100.0},
    ])
    out = merge_ime_into_plumelist(plumes, ime, radius_m=150.0)
    assert out.loc[0, "AvgIMEdivFetch20 (kg/m)"] == pytest.approx(0.7)
    assert out.loc[0, "StdIMEdivFetch20 (kg/m)"] == pytest.approx(0.1)
    # aspect from the nearest matched 20 m row
    assert out.loc[0, "Aspect ratio20"] == pytest.approx(0.7)
    assert np.isnan(out.loc[1, "AvgIMEdivFetch20 (kg/m)"])


def test_merge_ime_nearest_mergedist_when_no_20():
    """When 20 m is not among MERGEDISTS the nearest distance stands in."""
    from srcfinder_tpu.flow.ime_worker import merge_ime_into_plumelist

    ime = pd.DataFrame([
        dict(mergedist_m=10, ime_div_fetch=0.4, aspect=0.5,
             lat=36.0, lon=-119.5),
        dict(mergedist_m=50, ime_div_fetch=0.9, aspect=0.2,
             lat=36.0001, lon=-119.5),
    ])
    plumes = pd.DataFrame([
        {"Candidate ID": "c1", "Plume Latitude (deg)": 36.0001,
         "Plume Longitude (deg)": -119.5},
    ])
    out = merge_ime_into_plumelist(plumes, ime, radius_m=150.0)
    # nearest distance to 20 among (10, 50) is 10
    assert out.loc[0, "AvgIMEdivFetch20 (kg/m)"] == pytest.approx(0.4)
    assert out.loc[0, "Aspect ratio20"] == pytest.approx(0.5)


def test_harvest_cli(tmp_path):
    """srcfinder-harvest end-to-end with a file:// fetch via the yaml
    config (reference harvest.py CLI flags)."""
    from srcfinder_tpu.flow import harvester

    src = tmp_path / "remote"
    os.makedirs(src)
    for h in range(24):
        (src / f"file_{h:02d}.grib2").write_text(str(h))
    conf = tmp_path / "ds.yaml"
    conf.write_text(
        f"url_template: file://{src}/file_%H.grib2\n"
        "local_path_template: '%Y%m%d/file_%H.grib2'\n"
        "time_res: '6h'\n")
    rc = harvester.main(["-c", str(conf), "-b", str(tmp_path / "local"),
                         "-s", "20200924", "-n", "1"])
    assert rc == 0
    got = sorted(os.listdir(tmp_path / "local" / "20200924"))
    assert got == ["file_00.grib2", "file_06.grib2", "file_12.grib2",
                   "file_18.grib2"]


def test_msf_flow_end_to_end(tmp_path, rng):
    """Orchestrator: plume csv -> wind stats + emissions -> merged output
    with .bak on re-run (reference: msf_flow.py main flow)."""
    # winds
    winds = tmp_path / "winds"
    hdir = winds / "hrrr" / "20200924"
    os.makedirs(hdir)
    for hh in ("20", "21", "22"):
        flow.write_wind_grid_npz(
            str(hdir / f"hrrr.20200924{hh}.wrfsfcf00.npz"),
            make_grid(rng, u0=3.0, v0=4.0))
    # plume list
    pdir = tmp_path / "plumes"
    os.makedirs(pdir)
    plumecsv = pdir / "ang_plumes_minppmm500.csv"
    pd.DataFrame([{
        "Candidate ID": "ang20200924t211102-1",
        "Plume Latitude (deg)": 34.5,
        "Plume Longitude (deg)": -118.5,
        "AvgIMEdivFetch20 (kg/m)": 0.02,
        "StdIMEdivFetch20 (kg/m)": 0.004,
        "Aspect ratio20": 0.5,
    }]).to_csv(plumecsv, index=False)

    plumes = flow.process_plumes([str(plumecsv)], str(winds), nprocs=2,
                                 ext=".npz")
    assert len(plumes) == 1
    assert plumes[0]["Minimum Threshold (ppmm)"] == 500
    er_key = "Emission Rate (kg/hr) [HRRR 10 m]"
    assert er_key in plumes[0]

    outf = tmp_path / "out" / "merged.csv"
    flow.insert_plumes_in_file(list(plumes), str(outf),
                               sort_by_key="Candidate ID")
    assert outf.is_file()
    # merge again -> .bak created, rows doubled
    flow.insert_plumes_in_file(list(plumes), str(outf),
                               sort_by_key="Candidate ID")
    assert (tmp_path / "out" / "merged.csv.bak").is_file()
    back = pd.read_csv(outf)
    assert len(back) == 2


def test_wind_export_nc_classic(tmp_path, rng):
    """NetCDF-3 fallback engine (scipy round-trip)."""
    from srcfinder_tpu.flow import wind_export
    g = make_grid(rng, ny=12, nx=16)
    p = write_grid(tmp_path, "w.npz", g)
    ncf = str(tmp_path / "w.nc")
    wind_export.wind_grid_to_nc(p, ncf, engine="classic")
    from scipy.io import netcdf_file
    # mmap=False: with mmap the arrays alias the file and scipy warns on
    # close while they are still referenced
    with netcdf_file(ncf, "r", mmap=False) as nc:
        assert b"CF-1.8" in nc.Conventions
        u = nc.variables["u"][:]
        lats = nc.variables["lat"][:]
        assert u.shape == (len(lats), len(nc.variables["lon"][:]))
        assert abs(float(u.mean()) - float(g.u.mean())) < 0.2
        assert nc.variables["u"].standard_name == b"eastward_wind"


def test_wind_export_nc4(tmp_path, rng):
    """Default engine writes the reference's format: NetCDF-4 (HDF5 +
    dimension scales) with zlib-compressed (time, lat, lon) variables
    and the ACDD global-attribute table
    (reference: get_wind_bands.py:145-263 writes NETCDF4, zlib=True)."""
    h5py = pytest.importorskip("h5py")
    from srcfinder_tpu.flow import wind_export
    g = make_grid(rng, ny=12, nx=16)
    p = write_grid(tmp_path, "w.npz", g)
    ncf = str(tmp_path / "w4.nc")
    out = wind_export.wind_grid_to_nc(p, ncf)
    assert out == ncf
    with open(ncf, "rb") as f:
        assert f.read(8) == b"\x89HDF\r\n\x1a\n"       # HDF5 = NetCDF-4
    with h5py.File(ncf, "r") as f:
        u = f["u"]
        assert u.shape == (1, len(f["lat"]), len(f["lon"]))
        assert u.compression == "gzip"                  # the zlib vars
        assert f["lat"].attrs["CLASS"] == b"DIMENSION_SCALE"
        assert f["lat"].attrs["_Netcdf4Dimid"] == 1
        # dimension scales attached in (time, lat, lon) order
        assert f["u"].dims[1][0] == f["lat"]
        assert u.attrs["standard_name"] in ("eastward_wind",
                                            b"eastward_wind")
        vals = np.asarray(u[0])
        assert abs(float(vals.mean()) - float(g.u.mean())) < 0.2
        conv = f.attrs["Conventions"]
        conv = conv.decode() if isinstance(conv, bytes) else conv
        assert "CF-1.8" in conv and "ACDD" in conv
        for key in ("title", "summary", "time_coverage_start",
                    "geospatial_lat_min", "processing_level", "history"):
            assert key in f.attrs
        assert int(np.asarray(f["time"])[0]) == int(
            g.valid_date.replace(tzinfo=dt.timezone.utc).timestamp())


def test_wind_nc_cli(tmp_path, rng):
    """``srcfinder-wind-nc`` = the ``get_wind_bands.py -i GRANULE
    [-o OUT.nc]`` script surface (reference:
    msf_flow/wind_processor/get_wind_bands.py:26-45); the default
    output name maps dots/spaces to underscores (:40-45)."""
    from srcfinder_tpu.flow import wind_export
    g = make_grid(rng, ny=8, nx=10)
    p = write_grid(tmp_path, "w.npz", g)
    out = str(tmp_path / "o.nc")
    assert wind_export.main(["-i", p, "-o", out,
                             "--engine", "classic"]) == 0
    from scipy.io import netcdf_file
    with netcdf_file(out, "r") as nc:
        assert nc.variables["u"].shape == (len(nc.variables["lat"][:]),
                                           len(nc.variables["lon"][:]))
    assert (wind_export.default_nc_name("hrrr.2020092421.wrfsfcf00.grib2")
            == "hrrr_2020092421_wrfsfcf00.nc")


def test_stage_clis_cluster_dedup(tmp_path):
    """srcfinder-cluster / srcfinder-dedup = the standalone worker
    scripts (cluster_incr_nn.py:20-29, remove_duplicate_plumes.py:47-55)
    as thin CLIs over the tested APIs."""
    from srcfinder_tpu.flow import stage_clis

    pcsv = tmp_path / "p.csv"
    pd.DataFrame({
        "Candidate ID": ["ang20200924t211102-1", "ang20200924t211102-2",
                         "ang20200924t211102-3"],
        "Plume Latitude (deg)": [34.5, 34.5001, 35.2],
        "Plume Longitude (deg)": [-118.5, -118.5001, -118.0],
    }).to_csv(pcsv, index=False)
    outc = tmp_path / "clustered.csv"
    assert stage_clis.cluster_main(
        [str(pcsv), str(outc), "-r", "150", "-v"]) == 0
    got = pd.read_csv(outc)
    assert "Source ID" in got
    assert got["Source ID"][0] == got["Source ID"][1]
    assert got["Source ID"][0] != got["Source ID"][2]
    assert (tmp_path / "clustered.csv.pdf").is_file()

    dcsv = tmp_path / "d.csv"
    pd.DataFrame({
        "Line name": ["l1"] * 3,
        "Candidate ID": ["ang-01", "ang-02", "ang-03"],
        "Source ID": ["S1", "S2", "S3"],
        "Plume Latitude (deg)": [36.0, 36.0001, 36.5],
        "Plume Longitude (deg)": [-120.0, -120.0001, -120.5],
        "Emission Rate (kg/hr) [HRRR 10 m]": [100.0, 50.0, 70.0],
    }).to_csv(dcsv, index=False)
    outd = tmp_path / "deduped.csv"
    assert stage_clis.dedup_main([str(dcsv), str(outd)]) == 0
    kept = set(pd.read_csv(outd)["Candidate ID"])
    assert kept == {"ang-01", "ang-03"}
    # --max_overlap 1.0: nothing exceeds the threshold, all three kept
    outd2 = tmp_path / "deduped2.csv"
    assert stage_clis.dedup_main([str(dcsv), str(outd2),
                                  "--max_overlap", "1.0"]) == 0
    assert len(pd.read_csv(outd2)) == 3


def test_stage_clis_winds(tmp_path, rng):
    """srcfinder-windspeed / srcfinder-station-winds / srcfinder-wind-qc
    = running_windspeed.py:14-25, station_winds.py:17-25 and
    wind_quality_check.py:22-28 surfaces."""
    from srcfinder_tpu.flow import stage_clis

    winds = tmp_path / "winds"
    hdir = winds / "hrrr" / "20200924"
    os.makedirs(hdir)
    for hh in ("20", "21", "22"):
        flow.write_wind_grid_npz(
            str(hdir / f"hrrr.20200924{hh}.wrfsfcf00.npz"),
            make_grid(rng, u0=3.0, v0=4.0))
    pcsv = tmp_path / "ang_plumes_minppmm500.csv"
    pd.DataFrame([{
        "Candidate ID": "ang20200924t211102-1",
        "Plume Latitude (deg)": 34.5,
        "Plume Longitude (deg)": -118.5,
        "AvgIMEdivFetch20 (kg/m)": 0.02,
        "StdIMEdivFetch20 (kg/m)": 0.004,
        "Aspect ratio20": 0.5,
    }]).to_csv(pcsv, index=False)

    outw = tmp_path / "enriched.csv"
    assert stage_clis.windspeed_main(
        ["-p", str(tmp_path / "*plumes*.csv"), "-w", str(winds / "hrrr"),
         "--wind-ext", ".npz", "-o", str(outw)]) == 0
    got = pd.read_csv(outw)
    er = float(got["Emission Rate (kg/hr) [HRRR 10 m]"][0])
    assert er == pytest.approx(0.02 * 5.0 * 3600, rel=0.05)

    outs = tmp_path / "stations.csv"
    assert stage_clis.station_winds_main(
        [str(pcsv), str(outs), "faketoken"]) == 0
    got = pd.read_csv(outs)
    # zero-egress box: fetch fails -> the NaN fallback columns
    assert pd.isna(got["Station wind speed (m/s)"][0])
    assert pd.isna(got["Distance from station (km)"][0])

    gran = str(hdir / "hrrr.2020092420.wrfsfcf00.npz")
    assert stage_clis.wind_qc_main(["-f", gran]) == 0
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    assert stage_clis.wind_qc_main(["-f", str(bad)]) == 1


def _write_shp_square(path):
    """Minimal one-polygon (unit 0..10 square) shapefile."""
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    content = (struct.pack("<i", 5)
               + struct.pack("<4d", 0, 0, 10, 10)
               + struct.pack("<ii", 1, len(pts))
               + struct.pack("<i", 0)
               + pts.astype("<f8").tobytes())
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    flen = (100 + len(rec)) // 2
    header = (struct.pack(">i", 9994) + bytes(20) + struct.pack(">i", flen)
              + struct.pack("<ii", 1000, 5) + struct.pack("<8d", 0, 0, 10,
                                                          10, 0, 0, 0, 0))
    path.write_bytes(header + rec)


def _write_dbf(path, field, values, width=12):
    """Minimal dBASE III file with one character field."""
    hsize = 32 + 32 + 1
    rsize = 1 + width
    header = (bytes([3, 0, 0, 0]) + struct.pack("<I", len(values))
              + struct.pack("<HH", hsize, rsize) + bytes(20))
    fd = (field.encode().ljust(11, b"\x00") + b"C" + bytes(4)
          + bytes([width, 0]) + bytes(14))
    recs = b"".join(b" " + v.encode().ljust(width) for v in values)
    path.write_bytes(header + fd + b"\r" + recs)


def test_stage_clis_persistence_inversion(tmp_path):
    """srcfinder-persistence / srcfinder-inversion = the
    source_persistence.py and inversion-run.py worker surfaces."""
    from srcfinder_tpu.flow import stage_clis

    _write_shp_square(tmp_path / "fl.shp")
    # Name-fallback path: Flight_Run absent, names from Name.split()[0]
    _write_dbf(tmp_path / "fl.dbf", "Name", ["fl1 extra"])
    scsv = tmp_path / "sources.csv"
    pd.DataFrame({
        "Source identifier": ["A1", "A1", "A3"],
        "Plume Latitude (deg)": [5.0, 5.0, 50.0],
        "Plume Longitude (deg)": [5.0, 5.0, 50.0],
    }).to_csv(scsv, index=False)
    outp = tmp_path / "persistence.csv"
    assert stage_clis.persistence_main(
        [str(scsv), str(tmp_path / "fl.shp"), str(outp)]) == 0
    got = pd.read_csv(outp).set_index("Source identifier")
    assert got.loc["A1", "observed.plumes"] == 2
    assert got.loc["A1", "total.overflights"] == 1
    assert got.loc["A1", "source.Persistence"] == 2.0
    assert np.isnan(got.loc["A3", "source.Persistence"])

    gdir = tmp_path / "grid"
    os.makedirs(gdir)
    n = 4
    pd.DataFrame({"lat": [34.0, 34.1]}).to_csv(gdir / "lat.csv",
                                               index=False)
    pd.DataFrame({"lon": [-118.0, -118.1]}).to_csv(gdir / "lon.csv",
                                                   index=False)
    np.savetxt(gdir / "trop_H.csv", np.eye(n), delimiter=",")
    pd.DataFrame({"xch4": [1880.0] * n,
                  "back": [1860.0] * n}).to_csv(gdir / "trop_meta.csv",
                                                index=False)
    assert stage_clis.inversion_main([str(gdir), "--plot"]) == 0
    x_hat = np.loadtxt(gdir / "x_hat.csv", delimiter=",")
    # prior 10, obs 20, Sa=25, So=4 -> posterior 10 + 25/29*10 = 18.6
    assert x_hat.shape == (n,)
    np.testing.assert_allclose(x_hat, 10 + 25 / 29 * 10, rtol=1e-3)
    S_hat = np.loadtxt(gdir / "S_hat.csv", delimiter=",")
    assert S_hat.shape == (n, n)
    # posterior variance = (1/4 + 1/25)^-1 = 100/29
    np.testing.assert_allclose(np.diag(S_hat), 100 / 29, rtol=1e-3)
    assert (gdir / "x_hat.png").is_file()
    # event-runner form: the trop_meta.csv file path stands in for the
    # grid dir (the reference Lambda derives the dir from the rsel3 key)
    os.remove(gdir / "x_hat.csv")
    assert stage_clis.inversion_main([str(gdir / "trop_meta.csv")]) == 0
    assert (gdir / "x_hat.csv").is_file()


def test_parse_wind_filename_date():
    from srcfinder_tpu.flow.wind_export import parse_wind_filename_date
    import datetime as dt2
    assert (parse_wind_filename_date("hrrr.2020092421.wrfsfcf00.grib2")
            == dt2.datetime(2020, 9, 24, 21))
    assert (parse_wind_filename_date(
        "rtma2p5_ru.202009242115z.2dvaranl_ndfd.grib2")
        == dt2.datetime(2020, 9, 24, 21, 15))
    with pytest.raises(ValueError):
        parse_wind_filename_date("nope.grib2")


def test_ime_worker(tmp_path, rng):
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.flow import detection_ime_stats, compute_ime_for_cmf
    from srcfinder_tpu.core.physics import ime_scale
    cmf = np.zeros((60, 40), np.float32)
    cmf[10:14, 10:14] = 2000.0    # 16 px plume
    cmf[30, 30] = 3000.0          # 1 px, under MINAREA -> dropped
    cmf[0, 0] = -9999
    m = dict(proj="UTM", ulx=391000.0, uly=3786000.0, xps=3.0, yps=3.0,
             zone="11", hemi="North", rotation=0.0)
    df = detection_ime_stats(cmf, m)
    # one plume per merge distance (3 distances)
    assert sorted(df.mergedist_m.unique().tolist()) == [10, 20, 50]
    assert (df.area_px == 16).all()
    expect_ime = 16 * 2000.0 * ime_scale(3.0)
    np.testing.assert_allclose(df.ime_kg, expect_ime, rtol=1e-6)
    assert (df.fetch_m == 12.0).all()      # 4 px * 3 m
    assert 34 < df.lat.iloc[0] < 35

    # end-to-end from a CMF product
    prod = np.zeros((60, 40, 4), np.float32)
    prod[..., 3] = cmf
    envi_io.save_envi(str(tmp_path / "c.hdr"), prod,
                      metadata={"data ignore value": -9999,
                                "map info": ["UTM", "1", "1", "391000",
                                             "3786000", "3.0", "3.0", "11",
                                             "North", "WGS-84",
                                             "units=Meters", "rotation=0"]},
                      interleave="bip")
    df2, summary = compute_ime_for_cmf(str(tmp_path / "c"),
                                       out_csv=str(tmp_path / "ime.csv"))
    assert len(df2) == 3
    assert summary["AvgIMEdivFetch20 (kg/m)"] > 0
    import os
    assert os.path.isfile(str(tmp_path / "ime.csv"))


# ------------------------------------------------------ GRIB2 complex
# Independent encoder written from the WMO spec (FM 92 GRIB edition 2,
# templates 5.2/7.2 and 5.3/7.3) — shares NO code with the decoder under
# test, so round-trips genuinely validate the bit layout.

def _bitpack(values, width):
    """Big-endian bit packing -> uint8 array of bits (not bytes)."""
    values = np.asarray(values, np.int64)
    if width == 0:
        return np.zeros(0, np.uint8)
    out = np.zeros((len(values), width), np.uint8)
    for b in range(width):
        out[:, width - 1 - b] = (values >> b) & 1
    return out.ravel()


def _pad_byte(bits):
    pad = (-len(bits)) % 8
    return np.concatenate([bits, np.zeros(pad, np.uint8)])


def _sm_bytes(val, nbytes):
    """Sign-and-magnitude big-endian encoding (GRIB2 negative ints)."""
    sign = 1 << (nbytes * 8 - 1)
    mag = abs(int(val))
    assert mag < sign
    return int(mag | (sign if val < 0 else 0)).to_bytes(nbytes, "big")


def _encode_complex_field(number, level, values, spatial_order=0,
                          group_len=7, D=1):
    """Sections 4-7 for one field, complex packing (5.2) or complex with
    spatial differencing (5.3, order 1 or 2). Values must be multiples
    of 10^-D for a lossless round-trip."""
    y = np.asarray(values, np.float64).ravel()
    scaled = np.round(y * 10.0 ** D).astype(np.int64)
    R = float(scaled.min())
    x = scaled - np.int64(R)  # E=0

    z0 = []
    gmin = 0
    if spatial_order:
        d = x.astype(np.int64).copy()
        if spatial_order == 1:
            d[1:] = np.diff(x)
        elif spatial_order == 2:
            d[2:] = x[2:] - 2 * x[1:-1] + x[:-2]
            d[1] = 0
        z0 = [int(x[k]) for k in range(spatial_order)]
        gmin = int(d[spatial_order:].min())
        d[spatial_order:] -= gmin
        d[:spatial_order] = 0
        x = d

    groups = [x[i:i + group_len] for i in range(0, len(x), group_len)]
    refs = np.array([int(g.min()) for g in groups], np.int64)
    widths = []
    for g, r in zip(groups, refs):
        span = int(g.max() - r)
        widths.append(span.bit_length())
    nbits_ref = max(int(r).bit_length() for r in refs) or 1
    bits_w = max(w.bit_length() if isinstance(w, int) else 0
                 for w in widths) or 1

    stream = [_pad_byte(_bitpack(refs, nbits_ref)),
              _pad_byte(_bitpack(widths, bits_w)),
              _pad_byte(_bitpack(np.zeros(len(groups)), 0))]  # bits_len=0
    vbits = [_bitpack(g - r, w) for g, r, w in zip(groups, refs, widths)]
    stream.append(_pad_byte(np.concatenate(vbits) if vbits else
                            np.zeros(0, np.uint8)))
    payload = np.packbits(np.concatenate(stream)).tobytes()

    extra = b""
    ds = 4
    if spatial_order:
        for z in z0:
            extra += _sm_bytes(z, ds)
        extra += _sm_bytes(gmin, ds)

    # section 4: product definition template 4.0
    sec4 = bytearray(34)
    sec4[0:4] = struct.pack(">I", 34)
    sec4[4] = 4
    sec4[7:9] = struct.pack(">H", 0)
    sec4[9] = 2            # category: momentum
    sec4[10] = number
    sec4[22] = 103         # height above ground
    sec4[23] = 0           # scale factor
    sec4[24:28] = struct.pack(">I", level)

    # section 5
    tmpl = 3 if spatial_order else 2
    sec5 = bytearray(49 if spatial_order else 47)
    sec5[0:4] = struct.pack(">I", len(sec5))
    sec5[4] = 5
    sec5[5:9] = struct.pack(">I", len(y))
    sec5[9:11] = struct.pack(">H", tmpl)
    sec5[11:15] = struct.pack(">f", R)
    sec5[15:17] = _sm_bytes(0, 2)           # E
    sec5[17:19] = _sm_bytes(D, 2)           # D
    sec5[19] = nbits_ref
    sec5[20] = 0           # original field type: float
    sec5[21] = 1           # group splitting: general
    sec5[22] = 0           # missing mgmt: none
    sec5[31:35] = struct.pack(">I", len(groups))
    sec5[35] = 0           # group width reference
    sec5[36] = bits_w
    sec5[37:41] = struct.pack(">I", group_len)   # length reference
    sec5[41] = 1           # length increment
    sec5[42:46] = struct.pack(">I", len(groups[-1]))
    sec5[46] = 0           # bits for scaled lengths
    if spatial_order:
        sec5[47] = spatial_order
        sec5[48] = ds

    sec6 = struct.pack(">IBB", 6, 6, 255)
    sec7 = struct.pack(">IB", 5 + len(extra) + len(payload), 7) \
        + extra + payload
    return bytes(sec4) + bytes(sec5) + sec6 + sec7


def _encode_grib2_complex(path, grid, spatial_order=2, lambert=False,
                          levels=(10,)):
    """Full GRIB2 file: template 3.0 or 3.30 grid + complex packing."""
    d = grid.valid_date
    sec1 = (struct.pack(">IB", 21, 1) + bytes(7)
            + struct.pack(">H5B", d.year, d.month, d.day, d.hour,
                          d.minute, d.second) + bytes(2))
    ny, nx = grid.u.shape
    if lambert:
        sec3 = bytearray(81)
        sec3[0:4] = struct.pack(">I", 81)
        sec3[4] = 3
        sec3[12:14] = struct.pack(">H", 30)
        sec3[14] = 6                                   # sphere 6371229 m
        sec3[30:34] = struct.pack(">I", nx)
        sec3[34:38] = struct.pack(">I", ny)
        sec3[38:42] = _sm_bytes(21138123, 4)           # La1 (HRRR corner)
        sec3[42:46] = _sm_bytes(237280472, 4)          # Lo1
        sec3[47:51] = _sm_bytes(38500000, 4)           # LaD
        sec3[51:55] = _sm_bytes(262500000, 4)          # LoV
        sec3[55:59] = struct.pack(">I", 3000000)       # Dx = 3000 m
        sec3[59:63] = struct.pack(">I", 3000000)       # Dy
        sec3[63] = 0
        sec3[64] = 0x40                                # +i, +j
        sec3[65:69] = _sm_bytes(38500000, 4)           # Latin1
        sec3[69:73] = _sm_bytes(38500000, 4)           # Latin2
    else:
        sec3 = bytearray(72)
        sec3[0:4] = struct.pack(">I", 72)
        sec3[4] = 3
        sec3[12:14] = struct.pack(">H", 0)
        sec3[30:34] = struct.pack(">I", nx)
        sec3[34:38] = struct.pack(">I", ny)
        sec3[46:50] = _sm_bytes(int(grid.lat[0, 0] * 1e6), 4)
        sec3[50:54] = _sm_bytes(int(grid.lon[0, 0] * 1e6), 4)
        sec3[55:59] = _sm_bytes(int(grid.lat[-1, 0] * 1e6), 4)
        sec3[59:63] = _sm_bytes(int(grid.lon[0, -1] * 1e6), 4)

    payload = sec1 + bytes(sec3)
    for lev in levels:
        payload += _encode_complex_field(2, lev, grid.u, spatial_order)
        payload += _encode_complex_field(3, lev, grid.v, spatial_order)
    payload += _encode_complex_field(22, levels[0], grid.gust,
                                     spatial_order)
    payload += b"7777"
    total = 16 + len(payload)
    msg = (b"GRIB" + bytes([0, 0, 0, 2]) + struct.pack(">Q", total)
           + payload)
    with open(path, "wb") as f:
        f.write(msg)


def test_grib2_malformed_inputs_raise_cleanly(tmp_path, rng):
    """Corrupt GRIB2 files must raise ValueError with context — never
    hang (zero section length), struct.error, or TypeError. Downloaded
    granule corruption is the reference's motivation for
    wind_quality_check (msf_flow/harvester/wind_quality_check.py:86-135);
    the quality check must flag every variant."""
    import pytest as _pytest
    from srcfinder_tpu.flow.windgrid import read_grib2

    g = _tenths_grid(rng)
    good = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    _encode_grib2_complex(good, g, spatial_order=2)
    blob = open(good, "rb").read()

    def corrupt(name, data):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(data)
        return p

    cases = {}
    # 1. not a GRIB file at all
    cases["notgrib.grib2"] = b"\x89PNG not a grib" * 4
    # 2. truncated mid-message (no 7777 terminator in range)
    cases["trunc.grib2"] = blob[: len(blob) // 2]
    # 3. zero section length (would loop forever without the guard)
    zs = bytearray(blob)
    zs[16:20] = struct.pack(">I", 0)         # first section's length -> 0
    cases["zerosec.grib2"] = bytes(zs)
    # 4. section length pointing past the message end
    bs = bytearray(blob)
    bs[16:20] = struct.pack(">I", len(blob) + 1000)
    cases["longsec.grib2"] = bytes(bs)
    # 5. declared message length beyond the file
    ml = bytearray(blob)
    ml[8:16] = struct.pack(">Q", len(blob) + 512)
    cases["badmsglen.grib2"] = bytes(ml)
    # 6. unsupported grid template id (section 3 starts after sec1's
    #    21 bytes at offset 16+21; template half-word at +12)
    gt = bytearray(blob)
    gt[16 + 21 + 12: 16 + 21 + 14] = struct.pack(">H", 999)
    cases["badgridtmpl.grib2"] = bytes(gt)

    alerts = []
    for name, data in cases.items():
        p = corrupt(name, data)
        with _pytest.raises(ValueError):
            read_grib2(p)
        assert not flow.wind_quality_check(
            p, alert=lambda s, m: alerts.append(s)), name
    assert len(alerts) == len(cases)
    # the intact file still reads
    assert flow.wind_quality_check(good)


def _tenths_grid(rng, **kw):
    """Grid whose fields are exact multiples of 0.1 (lossless at D=1)."""
    g = make_grid(rng, **kw)
    return flow.WindGrid(g.lat, g.lon, np.round(g.u * 10) / 10,
                         np.round(g.v * 10) / 10,
                         np.round(g.gust * 10) / 10, g.valid_date)


def test_grib2_complex_packing_roundtrip(tmp_path, rng):
    """Template 5.2 (complex packing, multi-group, varying widths)."""
    g = _tenths_grid(rng)
    p = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    _encode_grib2_complex(p, g, spatial_order=0)
    back = flow.read_wind_grid(p)
    np.testing.assert_allclose(back.u, g.u, atol=1e-9)
    np.testing.assert_allclose(back.v, g.v, atol=1e-9)
    np.testing.assert_allclose(back.gust, g.gust, atol=1e-9)
    assert back.valid_date == g.valid_date


@pytest.mark.parametrize("order", [1, 2])
def test_grib2_spatial_differencing_roundtrip(tmp_path, rng, order):
    """Template 5.3 (complex packing + spatial differencing — the real
    NCEP HRRR encoding; reference reads it via eccodes,
    msf_flow/Dockerfile:10-56)."""
    g = _tenths_grid(rng, ny=11, nx=13)
    p = str(tmp_path / f"hrrr.202009242{order}.wrfsfcf00.grib2")
    _encode_grib2_complex(p, g, spatial_order=order)
    back = flow.read_wind_grid(p)
    np.testing.assert_allclose(back.u, g.u, atol=1e-9)
    np.testing.assert_allclose(back.v, g.v, atol=1e-9)
    np.testing.assert_allclose(back.gust, g.gust, atol=1e-9)


def test_grib2_multilevel_selects_altitude(tmp_path, rng):
    """u/v at both 10 m and 80 m in one file: alt selects the level
    (reference: windspeed.py:211-223 selects by band name)."""
    g = _tenths_grid(rng)
    g80 = flow.WindGrid(g.lat, g.lon, g.u + 2.0, g.v + 2.0, g.gust,
                        g.valid_date)
    p = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    # encode 10 m and 80 m u/v by writing both levels with level-shifted
    # values: craft manually
    d = g.valid_date
    sec1 = (struct.pack(">IB", 21, 1) + bytes(7)
            + struct.pack(">H5B", d.year, d.month, d.day, d.hour,
                          d.minute, d.second) + bytes(2))
    ny, nx = g.u.shape
    sec3 = bytearray(72)
    sec3[0:4] = struct.pack(">I", 72)
    sec3[4] = 3
    sec3[12:14] = struct.pack(">H", 0)
    sec3[30:34] = struct.pack(">I", nx)
    sec3[34:38] = struct.pack(">I", ny)
    sec3[46:50] = _sm_bytes(int(g.lat[0, 0] * 1e6), 4)
    sec3[50:54] = _sm_bytes(int(g.lon[0, 0] * 1e6), 4)
    sec3[55:59] = _sm_bytes(int(g.lat[-1, 0] * 1e6), 4)
    sec3[59:63] = _sm_bytes(int(g.lon[0, -1] * 1e6), 4)
    payload = sec1 + bytes(sec3)
    payload += _encode_complex_field(2, 10, g.u, 2)
    payload += _encode_complex_field(3, 10, g.v, 2)
    payload += _encode_complex_field(2, 80, g80.u, 2)
    payload += _encode_complex_field(3, 80, g80.v, 2)
    payload += _encode_complex_field(22, 10, g.gust, 2)
    payload += b"7777"
    msg = (b"GRIB" + bytes([0, 0, 0, 2])
           + struct.pack(">Q", 16 + len(payload)) + payload)
    with open(p, "wb") as f:
        f.write(msg)
    b10 = flow.read_wind_grid(p, alt=10)
    b80 = flow.read_wind_grid(p, alt=80)
    np.testing.assert_allclose(b10.u, g.u, atol=1e-9)
    np.testing.assert_allclose(b80.u, g.u + 2.0, atol=1e-9)


def test_grib2_lambert_grid(tmp_path, rng):
    """Template 3.30 Lambert conformal (the real HRRR grid): the decoded
    lat/lon must forward-project (independent in-test formulas) back to
    the regular x/y node grid, and node (0,0) is the advertised HRRR
    southwest corner."""
    g = _tenths_grid(rng, ny=6, nx=9)
    p = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    _encode_grib2_complex(p, g, spatial_order=2, lambert=True)
    back = flow.read_wind_grid(p)
    lat, lon = back.lat, back.lon
    # SW corner == La1/Lo1
    np.testing.assert_allclose(lat[0, 0], 21.138123, atol=1e-6)
    np.testing.assert_allclose(lon[0, 0], 237.280472 - 360.0, atol=1e-6)
    assert lat[1, 0] > lat[0, 0]       # +j scans north

    # independent forward Lambert projection (sphere R, tangent at 38.5)
    R, lat0, lon0 = 6371229.0, np.deg2rad(38.5), np.deg2rad(262.5)
    n = np.sin(lat0)
    F = np.cos(lat0) * np.tan(np.pi / 4 + lat0 / 2) ** n / n
    rho0 = R * F / np.tan(np.pi / 4 + lat0 / 2) ** n

    def fwd(la, lo):
        rho = R * F / np.tan(np.pi / 4 + np.deg2rad(la) / 2) ** n
        dl = n * np.deg2rad(((lo - 262.5 + 180.0) % 360.0) - 180.0)
        return rho * np.sin(dl), rho0 - rho * np.cos(dl)

    x00, y00 = fwd(lat[0, 0], lon[0, 0])
    for (j, i) in [(0, 5), (3, 0), (5, 8), (2, 4)]:
        x, y = fwd(lat[j, i], lon[j, i])
        np.testing.assert_allclose(x - x00, 3000.0 * i, atol=0.5)
        np.testing.assert_allclose(y - y00, 3000.0 * j, atol=0.5)


def test_wind_mnstd_over_complex_grib(tmp_path, rng):
    """End-to-end: windMNSTD over real-format complex-packed GRIB2 files
    (u=3, v=4 constant -> mean exactly 5.0)."""
    from srcfinder_tpu.flow.wind import wind_mnstd
    files = []
    for h in (20, 21):
        g = make_grid(rng, date=dt.datetime(2020, 9, 24, h, 0))
        g = flow.WindGrid(g.lat, g.lon, np.full_like(g.u, 3.0),
                          np.full_like(g.v, 4.0),
                          np.full_like(g.gust, 6.0), g.valid_date)
        p = str(tmp_path / f"hrrr.20200924{h}.wrfsfcf00.grib2")
        _encode_grib2_complex(p, g, spatial_order=2)
        files.append(p)
    res = wind_mnstd(10, (-118.5, 34.5), files)
    np.testing.assert_allclose(res[0], 5.0, atol=1e-9)
    np.testing.assert_allclose(res[1], 0.0, atol=1e-9)


def _encode_image_field(number, level, values, codec="j2k", D=1):
    """Sections 4-7 for one field, JPEG2000 (5.40) or PNG (5.41) image
    packing — encoded with Pillow, independent of the decoder under
    test. Values must be multiples of 10^-D with span < 2^16 for a
    lossless round-trip."""
    import io
    from PIL import Image

    y = np.asarray(values, np.float64)
    scaled = np.round(y * 10.0 ** D).astype(np.int64)
    R = float(scaled.min())
    x = scaled - np.int64(R)                      # E=0
    assert x.max() < (1 << 16)
    im = Image.fromarray(x.astype(np.uint16))     # mode I;16
    buf = io.BytesIO()
    if codec == "j2k":
        # raw codestream (SOC-marker), reversible 5/3 wavelet = lossless,
        # exactly what wgrib2/NCEP emit for RTMA
        im.save(buf, format="JPEG2000", irreversible=False, no_jp2=True)
        tmpl = 40
    else:
        im.save(buf, format="PNG")
        tmpl = 41
    payload = buf.getvalue()

    sec4 = bytearray(34)
    sec4[0:4] = struct.pack(">I", 34)
    sec4[4] = 4
    sec4[7:9] = struct.pack(">H", 0)
    sec4[9] = 2
    sec4[10] = number
    sec4[22] = 103
    sec4[23] = 0
    sec4[24:28] = struct.pack(">I", level)

    sec5 = bytearray(23 if tmpl == 40 else 21)
    sec5[0:4] = struct.pack(">I", len(sec5))
    sec5[4] = 5
    sec5[5:9] = struct.pack(">I", y.size)
    sec5[9:11] = struct.pack(">H", tmpl)
    sec5[11:15] = struct.pack(">f", R)
    sec5[15:17] = _sm_bytes(0, 2)                 # E
    sec5[17:19] = _sm_bytes(D, 2)                 # D
    sec5[19] = 16                                 # nbits (image depth)
    sec5[20] = 0                                  # original type: float
    if tmpl == 40:
        sec5[21] = 0                              # lossless
        sec5[22] = 255                            # ratio n/a

    sec6 = struct.pack(">IBB", 6, 6, 255)
    sec7 = struct.pack(">IB", 5 + len(payload), 7) + payload
    return bytes(sec4) + bytes(sec5) + sec6 + sec7


def _encode_grib2_image(path, grid, codec="j2k", levels=(10,)):
    """Full GRIB2 file: template 3.0 grid + JPEG2000/PNG packing (the
    real NCEP RTMA2.5 encoding is 5.40)."""
    d = grid.valid_date
    sec1 = (struct.pack(">IB", 21, 1) + bytes(7)
            + struct.pack(">H5B", d.year, d.month, d.day, d.hour,
                          d.minute, d.second) + bytes(2))
    ny, nx = grid.u.shape
    sec3 = bytearray(72)
    sec3[0:4] = struct.pack(">I", 72)
    sec3[4] = 3
    sec3[12:14] = struct.pack(">H", 0)
    sec3[30:34] = struct.pack(">I", nx)
    sec3[34:38] = struct.pack(">I", ny)
    sec3[46:50] = _sm_bytes(int(grid.lat[0, 0] * 1e6), 4)
    sec3[50:54] = _sm_bytes(int(grid.lon[0, 0] * 1e6), 4)
    sec3[55:59] = _sm_bytes(int(grid.lat[-1, 0] * 1e6), 4)
    sec3[59:63] = _sm_bytes(int(grid.lon[0, -1] * 1e6), 4)
    payload = sec1 + bytes(sec3)
    for lev in levels:
        payload += _encode_image_field(2, lev, grid.u, codec)
        payload += _encode_image_field(3, lev, grid.v, codec)
    payload += _encode_image_field(22, levels[0], grid.gust, codec)
    payload += b"7777"
    msg = (b"GRIB" + bytes([0, 0, 0, 2])
           + struct.pack(">Q", 16 + len(payload)) + payload)
    with open(path, "wb") as f:
        f.write(msg)


@pytest.mark.parametrize("codec", ["j2k", "png"])
def test_grib2_image_packing_roundtrip(tmp_path, rng, codec):
    """Templates 5.40 (JPEG2000 — the real NCEP RTMA encoding) and 5.41
    (PNG): lossless round-trip through Pillow-encoded fields."""
    pytest.importorskip("PIL")
    g = _tenths_grid(rng, ny=11, nx=13)
    p = str(tmp_path / "rtma2p5_ru.t2100z.2dvaranl_ndfd.grib2")
    _encode_grib2_image(p, g, codec=codec)
    back = flow.read_wind_grid(p)
    np.testing.assert_allclose(back.u, g.u, atol=1e-9)
    np.testing.assert_allclose(back.v, g.v, atol=1e-9)
    np.testing.assert_allclose(back.gust, g.gust, atol=1e-9)
    assert back.valid_date == g.valid_date


def test_grib2_image_packing_with_bitmap(tmp_path, rng):
    """Template 5.40 + a bitmap (real RTMA carries bitmaps at grid
    edges): the codestream encodes only the present points; absent
    points must come back NaN."""
    import io
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    g = _tenths_grid(rng, ny=6, nx=8)
    ny, nx = g.u.shape
    # mask out the last row (like an off-CONUS edge)
    present = np.ones(ny * nx, bool)
    present[-nx:] = False

    def enc_field(number, level, vals):
        y = np.asarray(vals, np.float64).ravel()[present]
        scaled = np.round(y * 10).astype(np.int64)
        R = float(scaled.min())
        x = (scaled - int(R)).astype(np.uint16)
        im = Image.fromarray(x[None, :])          # 1 x nvals image
        buf = io.BytesIO()
        im.save(buf, format="JPEG2000", irreversible=False, no_jp2=True)
        payload = buf.getvalue()
        sec4 = bytearray(34)
        sec4[0:4] = struct.pack(">I", 34); sec4[4] = 4
        sec4[7:9] = struct.pack(">H", 0); sec4[9] = 2; sec4[10] = number
        sec4[22] = 103; sec4[24:28] = struct.pack(">I", level)
        sec5 = bytearray(23)
        sec5[0:4] = struct.pack(">I", 23); sec5[4] = 5
        sec5[5:9] = struct.pack(">I", int(present.sum()))
        sec5[9:11] = struct.pack(">H", 40)
        sec5[11:15] = struct.pack(">f", R)
        sec5[15:17] = _sm_bytes(0, 2); sec5[17:19] = _sm_bytes(1, 2)
        sec5[19] = 16; sec5[21] = 0; sec5[22] = 255
        bits = np.packbits(present.astype(np.uint8)).tobytes()
        sec6 = struct.pack(">IBB", 6 + len(bits), 6, 0) + bits
        sec7 = struct.pack(">IB", 5 + len(payload), 7) + payload
        return bytes(sec4) + bytes(sec5) + sec6 + sec7

    d = g.valid_date
    sec1 = (struct.pack(">IB", 21, 1) + bytes(7)
            + struct.pack(">H5B", d.year, d.month, d.day, d.hour,
                          d.minute, d.second) + bytes(2))
    sec3 = bytearray(72)
    sec3[0:4] = struct.pack(">I", 72); sec3[4] = 3
    sec3[12:14] = struct.pack(">H", 0)
    sec3[30:34] = struct.pack(">I", nx); sec3[34:38] = struct.pack(">I", ny)
    sec3[46:50] = _sm_bytes(int(g.lat[0, 0] * 1e6), 4)
    sec3[50:54] = _sm_bytes(int(g.lon[0, 0] * 1e6), 4)
    sec3[55:59] = _sm_bytes(int(g.lat[-1, 0] * 1e6), 4)
    sec3[59:63] = _sm_bytes(int(g.lon[0, -1] * 1e6), 4)
    payload = sec1 + bytes(sec3)
    payload += enc_field(2, 10, g.u)
    payload += enc_field(3, 10, g.v)
    payload += enc_field(22, 10, g.gust)
    payload += b"7777"
    msg = (b"GRIB" + bytes([0, 0, 0, 2])
           + struct.pack(">Q", 16 + len(payload)) + payload)
    p = str(tmp_path / "rtma2p5_ru.t2100z.2dvaranl_ndfd.grib2")
    with open(p, "wb") as f:
        f.write(msg)

    back = flow.read_wind_grid(p)
    np.testing.assert_allclose(back.u[:-1], g.u[:-1], atol=1e-9)
    assert np.isnan(back.u[-1]).all()            # bitmapped-out row
    assert np.isnan(back.gust[-1]).all()
    np.testing.assert_allclose(back.v[:-1], g.v[:-1], atol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_grib2_randomized_roundtrip(tmp_path, seed):
    """Seeded randomized sweep across packings (5.2 / 5.3 order 1-2 /
    5.40 / 5.41), grid sizes and value ranges — property coverage for
    the hand-written codec beyond the crafted cases."""
    r = np.random.default_rng(seed)
    ny, nx = int(r.integers(3, 18)), int(r.integers(3, 18))
    scale = float(r.choice([0.1, 1.0, 10.0]))
    off = float(r.choice([-40.0, 0.0, 7.3]))
    def field():
        return np.round((r.normal(size=(ny, nx)) * scale + off) * 10) / 10
    g = flow.WindGrid(
        np.linspace(30, 31, ny)[:, None] * np.ones((1, nx)),
        np.ones((ny, 1)) * np.linspace(-110, -109, nx)[None, :],
        field(), field(), np.abs(field()),
        dt.datetime(2021, int(r.integers(1, 13)), 12, int(r.integers(24))))
    kind = ["c0", "c1", "c2", "j2k", "png"][seed % 5]
    p = str(tmp_path / f"hrrr.2021010100.wrfsfcf00.grib2")
    if kind.startswith("c"):
        _encode_grib2_complex(p, g, spatial_order=int(kind[1]))
    else:
        pytest.importorskip("PIL")
        _encode_grib2_image(p, g, codec=kind)
    back = flow.read_wind_grid(p)
    np.testing.assert_allclose(back.u, g.u, atol=1e-6)
    np.testing.assert_allclose(back.v, g.v, atol=1e-6)
    np.testing.assert_allclose(back.gust, g.gust, atol=1e-6)
    assert back.valid_date == g.valid_date


def test_sm_int():
    from srcfinder_tpu.flow.windgrid import _sm_int
    assert _sm_int(b"\x00\x0a") == 10
    assert _sm_int(b"\x80\x0a") == -10
    assert _sm_int(b"\x00\x00\x00\x05") == 5
    assert _sm_int(b"\x80\x00\x00\x05") == -5
    assert _sm_int(bytes([0])) == 0


def test_msf_flow_reads_xlsx_plume_list(tmp_path):
    """msf_flow ingests the xlsx plume list directly (the reference's
    canonical trigger artifact, salience_predictions.py:187-192)."""
    from srcfinder_tpu.core.xlsx import write_xlsx
    from srcfinder_tpu.flow.msf_flow import _dict_reader_plus_update
    rows = [["Candidate ID", "Plume Latitude (deg)",
             "Plume Longitude (deg)"],
            ["ang20200924t211102-1", 34.5, -118.5]]
    p = str(tmp_path / "plumes_minppmm500.xlsx")
    write_xlsx(p, rows)
    out = _dict_reader_plus_update(p, {"Minimum Threshold (ppmm)": 500})
    assert out[0]["Candidate ID"] == "ang20200924t211102-1"
    assert float(out[0]["Plume Latitude (deg)"]) == 34.5
    assert out[0]["Minimum Threshold (ppmm)"] == 500


def test_object_store_local(tmp_path):
    """The S3 surface with the local backend (reference communicates
    between stages exclusively through S3 objects,
    deployment/README.md:1-27)."""
    from srcfinder_tpu.flow.objectstore import (LocalObjectStore,
                                                open_store, split_uri)
    root = str(tmp_path / "bucket")
    store = LocalObjectStore(root)
    src = tmp_path / "a.txt"
    src.write_text("hello")
    store.put(str(src), "plumes/a.txt")
    assert store.exists("plumes/a.txt")
    assert not store.exists("plumes/b.txt")
    assert store.list("plumes/") == ["plumes/a.txt"]
    dest = str(tmp_path / "out" / "a.txt")
    store.get("plumes/a.txt", dest)
    assert open(dest).read() == "hello"
    with pytest.raises(ValueError):
        store.get("../../etc/passwd", str(tmp_path / "x"))

    assert split_uri("s3://buck/k/ey") == ("s3", "buck", "k/ey")
    assert split_uri("file:///d/ir") == ("file", "", "/d/ir")
    assert split_uri("/d/ir") == ("file", "", "/d/ir")
    st, key = open_store(root)
    assert key == "" and st.exists("plumes/a.txt")


def test_object_store_s3_gated():
    from srcfinder_tpu.flow.objectstore import S3ObjectStore
    try:
        import boto3  # noqa: F401
        pytest.skip("boto3 unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="boto3"):
        S3ObjectStore("bucket")


def test_grib2npz_cli(tmp_path, rng):
    """srcfinder-grib2npz: complex-packed GRIB2 -> npz with both
    altitudes; wind_mnstd consumes the converted file."""
    from srcfinder_tpu.flow.grib_cli import main
    from srcfinder_tpu.flow.wind import wind_mnstd
    g = _tenths_grid(rng)
    p = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    _encode_grib2_complex(p, g, spatial_order=2, levels=(10, 80))
    outdir = str(tmp_path / "npz")
    rc = main([p, "-o", outdir, "--alts", "10", "80"])
    assert rc == 0
    out = os.path.join(outdir, "hrrr.2020092421.wrfsfcf00.npz")
    back = flow.read_wind_grid(out, alt=10)
    np.testing.assert_allclose(back.u, g.u, atol=1e-9)
    back80 = flow.read_wind_grid(out, alt=80)
    np.testing.assert_allclose(back80.u, g.u, atol=1e-9)
    # a bad file keeps going with nonzero rc
    bad = str(tmp_path / "bad.grib2")
    open(bad, "wb").write(b"NOPE")
    assert main([bad, p, "-o", outdir]) == 1


def test_wind_export_from_complex_grib(tmp_path, rng):
    """get_wind_bands parity end-to-end over a REAL-format GRIB2 file
    (complex packing + Lambert grid) -> CF NetCDF at 0.025 deg
    (reference: get_wind_bands.py reads GRIB via pygrib/GDAL)."""
    from srcfinder_tpu.flow.wind_export import wind_grid_to_nc
    g = _tenths_grid(rng, ny=10, nx=14)
    p = str(tmp_path / "hrrr.2020092421.wrfsfcf00.grib2")
    _encode_grib2_complex(p, g, spatial_order=2, lambert=True)
    ncf = str(tmp_path / "out.nc")
    wind_grid_to_nc(p, ncf)
    h5py = pytest.importorskip("h5py")
    with h5py.File(ncf, "r") as f:
        conv = f.attrs["Conventions"]
        conv = conv.decode() if isinstance(conv, bytes) else conv
        assert "CF-1.8" in conv
        u = np.asarray(f["u"][0])
        assert np.isfinite(u[u > -9000]).all()


def test_msf_flow_cli_object_store(tmp_path, rng):
    """msf-flow --store: plume lists fetched from (and the merged output
    uploaded to) an object store — the reference's AWS S3 mode
    (msf_flow.py:286-348) with the local backend."""
    import csv as _csv
    from srcfinder_tpu.flow.msf_flow import main
    from srcfinder_tpu.flow.objectstore import LocalObjectStore

    # winds
    winds = tmp_path / "winds" / "hrrr" / "20200924"
    os.makedirs(winds)
    g = make_grid(rng)
    for h in (20, 21, 22):
        flow.write_wind_grid_npz(
            str(winds / f"hrrr.20200924{h}.wrfsfcf00.npz"),
            flow.WindGrid(g.lat, g.lon, np.full_like(g.u, 3.0),
                          np.full_like(g.v, 4.0), g.gust,
                          dt.datetime(2020, 9, 24, h, 0)))
    # plume list in the bucket
    plume = tmp_path / "plumes_minppmm500.csv"
    with open(plume, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["Candidate ID", "Plume Latitude (deg)",
                    "Plume Longitude (deg)"])
        w.writerow(["ang20200924t211102-1", 34.5, -118.5])
    bucket = str(tmp_path / "bucket")
    store = LocalObjectStore(bucket)
    store.put(str(plume), "plumes_minppmm500.csv")

    out = str(tmp_path / "merged.csv")
    rc = main(["-w", str(tmp_path / "winds"), "-o", out,
               "--wind-ext", ".npz", "--store", bucket])
    assert rc == 0
    assert store.exists("merged.csv")
    row = list(_csv.DictReader(open(out)))[0]
    winds_mean = [float(v) for k, v in row.items()
                  if "Wind Mean" in k and v not in ("", "NA")]
    assert winds_mean and abs(winds_mean[0] - 5.0) < 1e-6
