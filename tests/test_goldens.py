"""Golden regression fixtures.

The reference has no test suite to inherit (SURVEY §4); its only
regression oracle is the curated COVID systematics output. These goldens
freeze THIS framework's own numerical outputs on seeded synthetic inputs
so cross-round refactors cannot silently drift: the CMF MF scores (f64,
CPU) and the FCN saliency (f32) of fixed random inputs/weights.

Regenerate intentionally with:
    python tests/test_goldens.py regen
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _cmf_case():
    from tests.test_cmf_parity import synth_radiance
    from srcfinder_tpu.cmf import matched_filter as mfmod
    rng = np.random.default_rng(12345)
    x = synth_radiance(rng, L=96, C=6, B=16)
    abscf = -np.abs(rng.normal(size=16)) * 0.1
    alphas = mfmod.default_alphas()
    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns(x.astype(np.float64), m,
                                           abscf, alphas)
    return (np.asarray(res.mf), np.asarray(res.alpha_index))


def _fcn_case():
    from srcfinder_tpu.models import googlenet
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 64, 64, 1)), train=False)
    rng = np.random.default_rng(12345)
    img = rng.normal(size=(20, 45)).astype(np.float32)
    return (np.asarray(fcn_phase_saliency(model, variables,
                                          jnp.asarray(img))),)


def _masks_case():
    """4-band QC mask over a seeded synthetic cube (8 bands, all four
    tests + flare growth + cloud buffer exercised)."""
    from srcfinder_tpu.masks import MaskParams, masks_for_cube
    wl = np.array([450., 670., 1250., 2139., 500., 2000., 2200., 2400.],
                  np.float32)
    params = MaskParams(cld_bands=(0, 1, 2), dark_band=3, spec_band=4)
    rng = np.random.default_rng(12345)
    cube = np.abs(rng.normal(1.0, 0.5, (48, 24, 8))).astype(np.float32)
    cube[5:9, 5:9, 6] = 7.5          # saturated region -> flare growth
    cube[12, 12, 4] = 10.5
    cube[12, 12, 6] = 7.5            # specular
    cube[20:23, 3:6, 3] = 0.05       # dark
    cube[30:33, 10:12, 0] = 20.0     # cloud (negative slopes)
    cube[30:33, 10:12, 1] = 5.0
    cube[30:33, 10:12, 2] = 2.0
    cube[0, 0] = -9999.0             # nodata
    out = masks_for_cube(lambda r0, r1: cube[r0:r1], 48, 24, wl,
                         params=params, maskgrowradius_px=3.0,
                         mingrowarea=5, cldbfr_px=2.0, block_step=16,
                         nodata_row0=cube[..., 0] == -9999.0)
    return (out.astype(np.int16),)


def _ime_case():
    """Per-plume IME stats over a seeded CMF band (all merge distances)."""
    from srcfinder_tpu.flow.ime_worker import detection_ime_stats
    rng = np.random.default_rng(12345)
    cmf = rng.normal(200.0, 150.0, (64, 48)).astype(np.float32)
    cmf[10:16, 10:15] = 2500.0
    cmf[18:21, 18:20] = 3200.0       # merges with the above at 50 m
    cmf[40:44, 30:33] = 1800.0
    cmf[0, :] = -9999.0
    m = dict(proj="UTM", ulx=391000.0, uly=3786000.0, xps=3.0, yps=3.0,
             zone="11", hemi="North", rotation=0.0)
    df = detection_ime_stats(cmf, m)
    cols = ["mergedist_m", "plume", "area_px", "ime_kg", "fetch_m",
            "ime_div_fetch", "aspect", "row", "col", "lat", "lon"]
    return tuple(df[c].to_numpy(np.float64) for c in cols)


def _wind_case():
    """windMNSTD over seeded npz wind grids + the emission rate derived
    from the resulting stats (the enrichment numerics end-to-end)."""
    import datetime as _dt2
    import tempfile
    from srcfinder_tpu.flow.windgrid import WindGrid, write_wind_grid_npz
    from srcfinder_tpu.flow.wind import wind_mnstd
    from srcfinder_tpu.flow.emission import compute_emission_rate

    rng = np.random.default_rng(12345)
    lat0, lon0 = 36.04, -119.53
    lats = (np.linspace(lat0 - 1, lat0 + 1, 15)[:, None]
            * np.ones((1, 15)))
    lons = (np.linspace(lon0 - 1, lon0 + 1, 15)[None, :]
            * np.ones((15, 1)))
    with tempfile.TemporaryDirectory() as d:
        files = []
        for h in (20, 21, 22):
            g = WindGrid(lats, lons,
                         rng.normal(3.0, 0.7, lats.shape),
                         rng.normal(4.0, 0.7, lats.shape),
                         rng.normal(6.0, 0.7, lats.shape),
                         _dt2.datetime(2020, 9, 24, h))
            p = os.path.join(d, f"hrrr.20200924{h:02d}.wrfsfcf00.npz")
            write_wind_grid_npz(p, g)
            files.append(p)
        mean, std = wind_mnstd(10, (lon0, lat0), files)[:2]
    plume = {"AvgIMEdivFetch20 (kg/m)": 0.02,
             "StdIMEdivFetch20 (kg/m)": 0.005,
             "Aspect ratio20": 0.5,
             "Wind Mean (m/s) [hrrr 10 m, 10 nearest points for each of "
             "3 closest times]": mean,
             "Wind Std (m/s) [hrrr 10 m, 10 nearest points for each of "
             "3 closest times]": std}
    stats = compute_emission_rate(plume, "hrrr")
    er = [float(v) for k, v in stats.items() if "Emission" in k]
    return (np.array([mean, std]), np.array(er))


def _dedup_case():
    """Duplicate-plume filter: Teale Albers overlap matrix + the kept-row
    index set over a seeded clustered plume list."""
    import pandas as pd
    from srcfinder_tpu.flow.dedup import calculate_overlap, filter_plumes

    rng = np.random.default_rng(12345)
    n = 12
    lat = 36.0 + np.concatenate([rng.normal(0, 2e-4, 8),
                                 rng.normal(0.05, 2e-4, 4)])
    lon = -119.5 + np.concatenate([rng.normal(0, 2e-4, 8),
                                   rng.normal(0.05, 2e-4, 4)])
    flux = rng.uniform(50, 500, n)
    df = pd.DataFrame({"Plume Latitude (deg)": lat,
                       "Plume Longitude (deg)": lon,
                       "Source identifier": [f"S{i:03d}" for i in range(n)],
                       "Flux (kg/hr)": flux})
    overlaps = calculate_overlap(df)
    kept = filter_plumes(df, ["Flux (kg/hr)"])
    kept_idx = np.sort(np.asarray(kept.index, np.int64))
    return (overlaps["V2"].to_numpy(np.float64), kept_idx)


def _e2e_plumelist_case():
    """Full-pipeline plume-list golden (VERDICT r4 item 7): a small
    synthetic radiance runs radiance -> fused CMF+masks single-pass
    read -> FCN saliency -> salience2detections IN-PROCESS via
    flow.pipeline_cli.run_flightline — the same code path as the CLI —
    and the resulting canonical plume-list rows are pinned: candidate
    ids, georeferenced maxima (lat/lon), and the CMF ppmm stats. A
    refactor that moves the MF scale, the UTM geodesy, or the
    candidate labeling now fails CI instead of the eyeball (the unit
    goldens above pin each stage alone; nothing pinned the chain)."""
    import tempfile
    import pandas as pd
    from srcfinder_tpu.core.envi import save_envi
    from srcfinder_tpu.flow.pipeline_cli import run_flightline
    from srcfinder_tpu.models import googlenet
    from srcfinder_tpu.detect.cnn_cli import save_weights

    rng = np.random.default_rng(12345)
    L, C, B = 96, 32, 425
    cube = np.abs(rng.normal(4.0, 0.5, (L, C, B))).astype(np.float32) + 0.5
    absorb = np.ones(B, np.float32)
    absorb[360:410] = 0.9
    cube[40:46, 10:14] *= absorb          # plume in the active window
    cube[0, 0, :] = -9999.0               # nodata corner
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "272247.15", "3992010.65",
                         "3.1", "3.1", "11", "North", "WGS-84",
                         "units=Meters", "rotation=0"],
            "wavelength": [f"{w:.2f}" for w in np.linspace(380, 2500, B)]}
    with tempfile.TemporaryDirectory() as d:
        rdn = os.path.join(d, "ang20200924t211102_rdn_v2y1_img")
        save_envi(rdn + ".hdr", cube, metadata=meta, interleave="bil")
        lib = np.zeros((B, 3))
        lib[:, 0] = np.arange(1, B + 1)
        lib[:, 1] = np.linspace(380, 2500, B)
        lib[:, 2] = -np.abs(rng.normal(size=B)) * 0.1
        libf = os.path.join(d, "ang_ch4_unit_3col_425chan.txt")
        np.savetxt(libf, lib)
        model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
        wf = os.path.join(d, "w.npz")
        save_weights(wf, model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 1)),
                                    train=False))
        prods = run_flightline(rdn, libf, wf, os.path.join(d, "out"),
                               prob_thr=0.0, ppmm_thr=100.0,
                               do_masks=True, do_ime=True, col_chunk=32,
                               progress=lambda *a, **k: None)
        df = pd.read_csv(prods["detections_csv"])
        ime = pd.read_csv(prods["ime_csv"])
    df = df.sort_values("Candidate ID").reset_index(drop=True)
    geo = df[["Plume Latitude (deg)", "Plume Longitude (deg)"]
             ].to_numpy(np.float64)
    ppmm = df[["CMF Min (ppmm)", "CMF Max (ppmm)", "CMF Median (ppmm)",
               "CMF MAD (ppmm)"]].to_numpy(np.float64)
    ime_v = np.sort(ime["ime_kg"].to_numpy(np.float64))
    return (df["Candidate ID"].to_numpy(np.str_), geo, ppmm, ime_v)


_CASES = {"cmf_mf": _cmf_case, "fcn_saliency": _fcn_case,
          "masks": _masks_case, "ime": _ime_case, "wind": _wind_case,
          "dedup": _dedup_case, "e2e_plumelist": _e2e_plumelist_case}


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, name + ".npz")


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    path = _golden_path(name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (run: python "
                    "tests/test_goldens.py regen)")
    got = _CASES[name]()
    ref = np.load(path)
    assert len(ref.files) == len(got)
    for i in range(len(got)):
        g = np.asarray(got[i])
        if g.dtype.kind in "US":       # string columns (candidate ids)
            np.testing.assert_array_equal(g, ref[f"a{i:02d}"],
                                          err_msg=f"{name}[a{i:02d}]")
        else:
            np.testing.assert_allclose(g, ref[f"a{i:02d}"], rtol=1e-6,
                                       atol=1e-9,
                                       err_msg=f"{name}[a{i:02d}]")


if __name__ == "__main__":
    import sys
    # match the test environment (tests/conftest.py pins the CPU backend;
    # goldens generated on the TPU would differ — f64 there is emulated)
    jax.config.update("jax_platforms", "cpu")
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in _CASES.items():
            arrs = fn()
            np.savez(_golden_path(name),
                     **{f"a{i:02d}": a for i, a in enumerate(arrs)})
            print("wrote", _golden_path(name))
