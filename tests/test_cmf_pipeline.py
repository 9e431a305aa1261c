"""CMF pipeline end-to-end, multimodal, and sharding tests."""

import numpy as np
import pytest

import jax

from srcfinder_tpu.cmf import matched_filter as mfmod
from srcfinder_tpu.cmf import pipeline as pl
from srcfinder_tpu.core import envi as envi_io
from tests.test_cmf_parity import oracle_cmf, synth_radiance


def _write_flightline(tmp_path, rng, L=40, C=10, B=425):
    """Tiny BIL radiance cube + ch4 library file."""
    x = np.abs(rng.normal(loc=4.0, size=(L, C, B))).astype(np.float64) + 0.5
    x[3, 2, 400] = -1.0  # one invalid pixel
    # (lines, samples, bands) saved as bil
    hdr = str(tmp_path / "ang_test_rdn.hdr")
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "272247.1", "3992010.6", "3.1",
                         "3.1", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"]}
    envi_io.save_envi(hdr, x, metadata=meta, interleave="bil")
    lib = np.zeros((425, 3))
    lib[:, 0] = np.arange(1, 426)
    lib[:, 1] = np.linspace(350, 2500, 425)
    lib[:, 2] = -np.abs(rng.normal(size=425)) * 0.1
    libf = str(tmp_path / "ang_ch4_unit_3col_425chan.txt")
    np.savetxt(libf, lib)
    return hdr[:-4], libf, x, lib


def test_active_range():
    assert pl.active_range_for_library("ang_ch4_unit_3col_425chan.txt") == (351, 422)
    assert pl.active_range_for_library("x_ch4_y.txt", reflectance=True) == (5, 420)
    assert pl.active_range_for_library("co2_lib.txt") == (309, 391)
    with pytest.raises(ValueError):
        pl.active_range_for_library("n2o.txt")


def test_pipeline_end_to_end(tmp_path, rng):
    infile, libf, x, lib = _write_flightline(tmp_path, rng)
    outfile = str(tmp_path / "ang_test_cmf")
    out = pl.robust_mf_image(infile, libf, outfile, dtype=np.float64,
                             col_chunk=4, save_bgmeta=True)

    img = envi_io.open_envi(outfile)
    assert img.nbands == 4
    assert img.metadata["band names"][-1] == "CH4 Absorption (ppm x m)"
    dat = img.load()
    # nodata stamped at the invalid pixel
    assert dat[3, 2, 3] == -9999
    # rgb bands copied
    np.testing.assert_allclose(dat[..., 0], x[:, :, 60])

    # parity of the MF band against the oracle on the active window
    active = (351, 422)
    abscf = lib[active[0] - 1: active[1], 2]
    xa = x[:, :, active[0] - 1: active[1]]                     # (L, C, B)
    mf_ref, _, _ = oracle_cmf(xa, abscf, mfmod.default_alphas())
    got = dat[..., 3]
    ref = np.where(mf_ref != 0, mf_ref * mfmod.PPM_SCALING, got)
    valid = got != -9999
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-4, atol=1e-3)

    # column stats CSV exists with one row per column
    import pandas as pd
    df = pd.read_csv(out["colcsv"])
    assert len(df) == 10
    assert set(["npix", "avg", "std"]).issubset(df.columns)
    # bgmeta written
    bg = envi_io.open_envi(outfile + "_bgmeta")
    assert bg.nbands == 2


def test_pipeline_chunking_invariance(tmp_path, rng):
    infile, libf, x, lib = _write_flightline(tmp_path, rng, C=7)
    out1 = str(tmp_path / "o1")
    out2 = str(tmp_path / "o2")
    pl.robust_mf_image(infile, libf, out1, dtype=np.float64, col_chunk=3)
    pl.robust_mf_image(infile, libf, out2, dtype=np.float64, col_chunk=7)
    d1 = envi_io.open_envi(out1).load()
    d2 = envi_io.open_envi(out2).load()
    np.testing.assert_allclose(d1, d2, rtol=1e-10, atol=1e-8)


def test_multimodal_recovers_known_partition(rng):
    """Two well-separated background modes per column: the multimodal MF
    must match unimodal MF run on each true partition separately."""
    L, C, B = 160, 3, 12
    mean1 = np.full(B, 3.0) + rng.uniform(0, 0.5, B)
    mean2 = np.full(B, 9.0) + rng.uniform(0, 0.5, B)
    x = np.empty((L, C, B))
    true_lab = np.zeros((L, C), int)
    for c in range(C):
        half = L // 2
        x[:half, c] = mean1 + rng.normal(size=(half, B)) * 0.2
        x[half:, c] = mean2 + rng.normal(size=(L - half, B)) * 0.2
        true_lab[half:, c] = 1
    x = np.abs(x)
    abscf = -np.abs(rng.normal(size=B)) * 0.1
    alphas = mfmod.default_alphas()

    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns_multimodal(
            x, m, abscf, alphas, bgmodes=2, pcadim=4)
        lab = np.asarray(res.labels)
        # clustering should recover the partition (up to label swap)
        agree = (lab == true_lab).mean()
        assert agree > 0.99 or agree < 0.01

        mf_mm = np.asarray(res.mf)
        # reference per-partition MF; the reference passes the FULL
        # column count into each cluster's looshrinkage
        # (robust_mf.py:355-356), threaded here as n_loo
        n_full = np.asarray(m).sum(axis=0).astype(np.float64)
        for part in (0, 1):
            pm = np.asarray(m) * (true_lab == part)
            r = mfmod.matched_filter_columns(x, pm.astype(np.float64),
                                             abscf, alphas,
                                             n_loo=jax.numpy.asarray(n_full))
            mf_part = np.asarray(r.mf)
            sel = pm > 0
            np.testing.assert_allclose(mf_mm[sel], mf_part[sel],
                                       rtol=1e-6, atol=1e-8)


def test_multimodal_rejection(rng):
    """A tiny third cluster must be rejected (no estimate) when reject=True."""
    L, C, B = 140, 2, 10   # bgminsamp = 12
    x = np.abs(rng.normal(loc=5.0, size=(L, C, B))) + 0.5
    # 5 extreme outlier pixels forming their own cluster
    x[:5] *= 10.0
    abscf = -np.abs(rng.normal(size=B)) * 0.1
    alphas = mfmod.default_alphas()
    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns_multimodal(
            x, m, abscf, alphas, bgmodes=2, pcadim=4, reject=True)
    rej = np.asarray(res.rejected)
    valid = np.asarray(res.valid)
    assert rej.any()       # the small cluster was rejected somewhere
    # rejected pixels carry no estimate
    lab = np.asarray(res.labels)
    for c in range(C):
        for k in range(2):
            if rej[c, k]:
                assert not valid[lab[:, c] == k, c].any()


def test_regfull_target(problem_regfull=None, rng=np.random.default_rng(7)):
    """regfull shrinks toward the full-column covariance; verify against a
    direct numpy computation of the generalized form."""
    L, C, B = 90, 2, 8
    x = np.abs(rng.normal(loc=4.0, size=(L, C, B))) + 0.5
    abscf = -np.abs(rng.normal(size=B)) * 0.1
    alphas = mfmod.default_alphas()
    m = np.ones((L, C))
    Tfull = np.empty((C, B, B))
    for c in range(C):
        Tfull[c] = np.cov(x[:, c, :].T, ddof=1)
    with jax.enable_x64(True):
        res = mfmod.matched_filter_columns(x, m, abscf, alphas,
                                           T=jax.numpy.asarray(Tfull))
    # oracle: direct nll computation with T == S (full covariance)
    for c in range(C):
        S = np.cov(x[:, c, :].T, ddof=1)
        mu = x[:, c, :].mean(axis=0)
        X = x[:, c, :] - mu
        nuse = L
        nll = np.full(len(alphas), np.inf)
        for i, a in enumerate(alphas):
            beta = (1 - a) / (nuse - 1.0)
            G = nuse * beta * S + a * S   # T == S here
            sign, logdet = np.linalg.slogdet(G)
            r_k = (X @ np.linalg.inv(G) * X).sum(axis=1)
            q = 1 - beta * r_k
            nll[i] = (0.5 * (B * np.log(2 * np.pi) + logdet)
                      + (np.log(q) + r_k / q).sum() / (2 * nuse))
        assert int(np.argmin(nll)) == int(np.asarray(res.alpha_index)[c])


def test_sharded_columns_match_single_device(rng):
    """CMF over an 8-device CPU mesh == single-device result."""
    from srcfinder_tpu.parallel import make_mesh, shard_columns_mf
    L, C, B = 64, 16, 8
    x = np.abs(rng.normal(loc=4.0, size=(L, C, B))).astype(np.float32) + 0.5
    abscf = (-np.abs(rng.normal(size=B)) * 0.1).astype(np.float32)
    alphas = mfmod.default_alphas(np.float32)
    m = np.asarray(mfmod.valid_mask(x)).astype(np.float32)

    res1 = mfmod.matched_filter_columns(x, m, abscf, alphas)
    mesh = make_mesh(8)
    res8 = shard_columns_mf(mesh, x, m, abscf, alphas)
    np.testing.assert_allclose(np.asarray(res8.mf), np.asarray(res1.mf),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res8.alpha_index),
                                  np.asarray(res1.alpha_index))


def test_cli_smoke(tmp_path, rng):
    from srcfinder_tpu.cmf import cli
    infile, libf, x, lib = _write_flightline(tmp_path, rng, L=24, C=4)
    outfile = str(tmp_path / "cli_out")
    rc = cli.main([infile, libf, outfile, "--dtype", "float64",
                   "--col_chunk", "4"])
    assert rc == 0
    img = envi_io.open_envi(outfile)
    assert img.nbands == 4


def test_f32_cond_fallback_reroutes_to_f64(tmp_path, rng):
    """Float32 pipeline + near-singular columns: the cond-flagged columns
    are recomputed in f64 on the CPU (pipeline.py cond_thresh), so the
    full-image output tracks the all-f64 run; with the fallback disabled
    they diverge by orders of magnitude (the regime quantified in
    tests/test_cmf_f32.py)."""
    L, C = 200, 6
    infile, libf, x, lib = _write_flightline(tmp_path, rng, L=L, C=C)
    # overwrite columns 1 and 4: rank-4 data in the active window
    x = x.copy()
    nb = 422 - 350
    for c in (1, 4):
        U = rng.normal(size=(4, nb))
        x[:, c, 350:422] = np.abs(
            rng.normal(size=(L, 4)) @ U
            + rng.normal(size=(L, nb)) * 1e-4 + 6.0)
    envi_io.save_envi(infile + ".hdr", x,
                      metadata=envi_io.open_envi(infile).metadata,
                      interleave="bil", force=True)

    def run(name, **kw):
        out = str(tmp_path / name)
        pl.robust_mf_image(infile, libf, out, col_chunk=3, **kw)
        return np.asarray(envi_io.open_envi(out).load())[..., -1]

    mf64 = run("out64", dtype=np.float64)
    mf32 = run("out32", dtype=np.float32)               # fallback on
    mf32_raw = run("out32raw", dtype=np.float32, cond_thresh=0.0)

    scale = np.abs(mf64).max()
    err_fb = np.abs(mf32 - mf64).max() / scale
    err_raw = np.abs(mf32_raw[:, [1, 4]] - mf64[:, [1, 4]]).max() / scale
    assert err_fb < 5e-3                     # tracks the f64 oracle
    assert err_raw > 10 * err_fb             # fallback genuinely needed


def test_f32_cond_fallback_multimodal(tmp_path, rng):
    """Multimodal (-k 2) float32 pipeline + a near-singular background
    mode: the per-(column, mode) cond gate reroutes the flagged columns
    through the full f64 multimodal path on the CPU (VERDICT r2 item 5 —
    previously the f32 failure regime was silently reachable via -k)."""
    L, C = 240, 6
    infile, libf, x, lib = _write_flightline(tmp_path, rng, L=L, C=C)
    x = x.copy()
    # two clearly separated background modes in every column
    x[: L // 2] += 8.0
    nb = 422 - 350
    # columns 1 and 4: the BRIGHT mode is rank-4 in the active window
    # (offset inside abs: folding a shifted low-rank signal keeps rank 4)
    for c in (1, 4):
        U = rng.normal(size=(4, nb))
        x[: L // 2, c, 350:422] = np.abs(
            rng.normal(size=(L // 2, 4)) @ U
            + rng.normal(size=(L // 2, nb)) * 1e-4 + 12.0)
    envi_io.save_envi(infile + ".hdr", x,
                      metadata=envi_io.open_envi(infile).metadata,
                      interleave="bil", force=True)

    def run(name, **kw):
        out = str(tmp_path / name)
        pl.robust_mf_image(infile, libf, out, col_chunk=3, bgmodes=2,
                           pcadim=4, **kw)
        return np.asarray(envi_io.open_envi(out).load())[..., -1]

    mf64 = run("out64", dtype=np.float64)
    mf32 = run("out32", dtype=np.float32)               # fallback on
    mf32_raw = run("out32raw", dtype=np.float32, cond_thresh=0.0)

    scale = np.abs(mf64).max()
    err_fb = np.abs(mf32 - mf64).max() / scale
    err_raw = np.abs(mf32_raw[:, [1, 4]] - mf64[:, [1, 4]]).max() / scale
    assert err_fb < 5e-3                     # tracks the f64 oracle
    assert err_raw > 10 * err_fb             # fallback genuinely needed


def test_sharded_multimodal_matches_single_device(rng):
    """Multimodal CMF with the column axis sharded over the 8-device CPU
    mesh == single device (VERDICT r1 item 9)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from srcfinder_tpu.parallel import make_mesh

    L, C, B = 96, 16, 8
    x = np.abs(rng.normal(4.0, 1.0, size=(L, C, B))).astype(np.float32) + 0.5
    x[:L // 2] += 4.0                      # two background modes
    abscf = (-np.abs(rng.normal(size=B)) * 0.1).astype(np.float32)
    alphas = mfmod.default_alphas(np.float32)
    m = np.asarray(mfmod.valid_mask(x)).astype(np.float32)

    ref = mfmod.matched_filter_columns_multimodal(
        jnp.asarray(x), jnp.asarray(m), jnp.asarray(abscf),
        jnp.asarray(alphas), bgmodes=2, pcadim=4)

    mesh = make_mesh(8, axis_names=("data",))
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P(None, "data", None)))
    ms = jax.device_put(jnp.asarray(m), NamedSharding(mesh, P(None, "data")))
    got = mfmod.matched_filter_columns_multimodal(
        xs, ms, jnp.asarray(abscf), jnp.asarray(alphas), bgmodes=2,
        pcadim=4)
    np.testing.assert_allclose(np.asarray(got.mf), np.asarray(ref.mf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(ref.labels))


def test_cli_multimodal_smoke(tmp_path, rng):
    """CLI with -k 2 -f -r -m (multimodal + regfull + reject + bgmeta) —
    the reference's full flag surface (robust_mf.py:139-167)."""
    from srcfinder_tpu.cmf import cli
    infile, libf, x, lib = _write_flightline(tmp_path, rng, L=64, C=4)
    outfile = str(tmp_path / "cli_mm_out")
    rc = cli.main([infile, libf, outfile, "--dtype", "float64",
                   "--col_chunk", "4", "-k", "2", "-f", "-r", "-m"])
    assert rc == 0
    img = envi_io.open_envi(outfile)
    assert img.nbands == 4
    bg = envi_io.open_envi(outfile + "_bgmeta")
    dat = np.asarray(bg.load())
    assert dat.shape[2] == 2           # cluster id + alpha index
    assert len(np.unique(dat[..., 0])) >= 2   # both modes present somewhere


def test_kmeans_three_modes_and_per_column_seeding(rng):
    """Regression: k-means++ seeding must measure distance to the same
    COLUMN's centroids (the old broadcast compared against every
    column's centroid — silently wrong at k=2, a shape error at k=3)."""
    import jax.numpy as jnp
    from srcfinder_tpu.cmf.kmeans import kmeans_columns

    L, C, P = 120, 5, 3
    centers = rng.normal(scale=10.0, size=(C, 3, P))  # distinct per col
    z = np.empty((L, C, P), np.float32)
    true_lab = np.zeros((L, C), int)
    for c in range(C):
        for k in range(3):
            sl = slice(k * (L // 3), (k + 1) * (L // 3))
            z[sl, c] = centers[c, k] + rng.normal(scale=0.1,
                                                  size=(L // 3, P))
            true_lab[sl, c] = k
    m = np.ones((L, C), np.float32)
    labels, cent = kmeans_columns(jnp.asarray(z), jnp.asarray(m), 3,
                                  iters=25, seed=0)
    labels = np.asarray(labels)
    # each true cluster maps to exactly one label per column
    for c in range(C):
        for k in range(3):
            got = labels[true_lab[:, c] == k, c]
            assert (got == got[0]).all()
        assert len(np.unique(labels[:, c])) == 3
    # centroids belong to their own column's centers
    cent = np.asarray(cent)
    for c in range(C):
        for k in range(3):
            d = np.linalg.norm(centers[c] - cent[c, k][None], axis=1).min()
            assert d < 1.0


def test_warm_tpu_async_dedupes_and_matches_signature(tmp_path, rng):
    """warm_tpu_async stages the exact executable the column loop uses
    (same shapes/options -> jit cache hit), dedupes per process, and a
    warmed-first run produces the identical product."""
    from srcfinder_tpu.cmf import pipeline as cp

    infile, libf, x, lib = _write_flightline(tmp_path, rng, L=24, C=4)
    a0, a1 = cp.active_range_for_library(libf)
    nb = a1 - a0 + 1

    cp._WARMED.clear()
    t = cp.warm_tpu_async(24, 4, nb)
    assert t is not None
    t.join(timeout=120)
    assert not t.is_alive()
    # identical signature -> deduped; f64 -> skipped by design
    assert cp.warm_tpu_async(24, 4, nb) is None
    assert cp.warm_tpu_async(24, 4, nb, dtype=np.float64) is None

    out = str(tmp_path / "warm_out")
    cp.robust_mf_image(infile, libf, out, dtype=np.float32, col_chunk=4)
    img = envi_io.open_envi(out)
    assert img.nbands == 4
