"""Golden parity: the TPU eigenbasis matched filter vs a direct NumPy port
of the reference algorithm (reference: cmf/robust_mf.py:92-136 looshrinkage,
:297-397 column loop).

The oracle below re-implements the reference literally — per-column loop,
per-alpha dense G_alpha with slogdet + inv (slogdet rather than det only to
avoid float overflow; identical math when det > 0), including the
stability_scaling=100 — so any algebra error in the eigenbasis
reformulation shows up as a mismatch here.
"""

import numpy as np
import pytest

import jax

from srcfinder_tpu.cmf import matched_filter as mfmod


# ----------------------------------------------------------------- oracle
def oracle_cmf(x, abscf, alphas, reflectance=False, model="looshrinkage"):
    L, C, B = x.shape
    mf_img = np.zeros((L, C))
    alpha_idx = np.full(C, -2, dtype=int)
    nll_all = np.full((C, len(alphas)), np.inf)
    for c in range(C):
        Icol_full = x[:, c, :]
        use = np.where((~(Icol_full < 0) & np.isfinite(Icol_full)).all(axis=1))[0]
        Icol = Icol_full[use].astype(np.float64)
        nuse = len(Icol)
        if nuse == 0:
            continue
        mu = Icol.mean(axis=0)
        I_zm = Icol - mu

        if model == "looshrinkage":
            s = 100.0  # reference stability_scaling (robust_mf.py:94)
            X = I_zm * s
            S = np.cov(X.T, ddof=1)
            T = np.diag(np.diag(S))
            nll = np.full(len(alphas), np.inf)
            nchanlog2pi = B * np.log(2 * np.pi)
            for i, a in enumerate(alphas):
                beta = (1 - a) / (nuse - 1.0)
                G = nuse * (beta * S) + a * T
                sign, logdet = np.linalg.slogdet(G)
                if sign <= 0:
                    continue
                r_k = (X @ np.linalg.inv(G) * X).sum(axis=1)
                q = 1 - beta * r_k
                if (q <= 0).any():
                    continue
                nll[i] = (0.5 * (nchanlog2pi + logdet)
                          + (np.log(q) + r_k / q).sum() / (2 * nuse))
            mindex = int(np.argmin(nll))
            if np.isfinite(nll[mindex]):
                alpha = alphas[mindex]
            else:
                mindex, alpha = -1, 0.0
            nll_all[c] = nll
            alpha_idx[c] = mindex
        else:
            alpha = 0.0
            alpha_idx[c] = 0

        S = np.cov(I_zm.T, ddof=1)
        T = np.diag(np.diag(S))
        Cov = (1 - alpha) * S + alpha * T
        Cinv = np.linalg.inv(Cov)
        target = (abscf - mu) if reflectance else (abscf * mu)
        normalizer = target @ Cinv @ target
        mf_img[use, c] = (I_zm @ Cinv @ target) / normalizer
    return mf_img, alpha_idx, nll_all


# ------------------------------------------------------------ fixtures
def synth_radiance(rng, L=120, C=5, B=16, invalid_frac=0.08):
    """Positive correlated 'radiance' with some invalid pixels and a few
    embedded plume-like enhancements."""
    mean = rng.uniform(1.0, 8.0, size=(C, B))
    A = rng.normal(size=(C, B, B)) * 0.15
    x = np.einsum("lcb,cbd->lcd", rng.normal(size=(L, C, B)), A) + mean
    x = np.abs(x) + 0.05
    # plume-ish multiplicative absorption on a few pixels
    absorb = rng.uniform(0.9, 0.99, size=B)
    for (l, c) in [(5, 1), (17, 3)]:
        x[l, c] *= absorb
    # invalid pixels: negatives and nans on whole rows
    nbad = int(invalid_frac * L)
    for c in range(C):
        rows = rng.choice(L, size=nbad, replace=False)
        x[rows[: nbad // 2], c, 0] = -1.0
        x[rows[nbad // 2:], c, 1] = np.nan
    return x


@pytest.fixture
def problem(rng):
    x = synth_radiance(rng)
    B = x.shape[2]
    abscf = -np.abs(rng.normal(size=B)) * 0.1  # absorption coefficients
    alphas = mfmod.default_alphas()
    return x, abscf, alphas


# ------------------------------------------------------------------ tests
def test_parity_looshrinkage(problem):
    x, abscf, alphas = problem
    mf_ref, aidx_ref, nll_ref = oracle_cmf(x, abscf, alphas)

    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns(
            x.astype(np.float64), m, abscf, alphas)
    aidx = np.asarray(res.alpha_index)
    np.testing.assert_array_equal(aidx, aidx_ref)
    np.testing.assert_allclose(np.asarray(res.mf), mf_ref, rtol=1e-5, atol=1e-7)
    # nll differs from the reference by the constant B*log(100) from
    # stability_scaling; compare shapes relative to per-column minimum
    nll = np.asarray(res.nll)
    fin = np.isfinite(nll_ref) & np.isfinite(nll)
    rel_ref = nll_ref - np.nanmin(np.where(fin, nll_ref, np.nan), axis=1, keepdims=True)
    rel = nll - np.nanmin(np.where(fin, nll, np.nan), axis=1, keepdims=True)
    np.testing.assert_allclose(rel[fin], rel_ref[fin], rtol=1e-6, atol=1e-8)


def test_parity_reflectance(problem):
    x, abscf, alphas = problem
    mf_ref, aidx_ref, _ = oracle_cmf(x, np.abs(abscf), alphas, reflectance=True)
    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns(
            x.astype(np.float64), m, np.abs(abscf), alphas, reflectance=True)
    np.testing.assert_array_equal(np.asarray(res.alpha_index), aidx_ref)
    np.testing.assert_allclose(np.asarray(res.mf), mf_ref, rtol=1e-5, atol=1e-7)


def test_parity_empirical(problem):
    x, abscf, alphas = problem
    mf_ref, _, _ = oracle_cmf(x, abscf, alphas, model="empirical")
    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns(
            x.astype(np.float64), m, abscf, alphas, model="empirical")
    np.testing.assert_allclose(np.asarray(res.mf), mf_ref, rtol=1e-5, atol=1e-7)


def test_f32_close_to_f64(problem):
    """Single precision (TPU-native) tracks the f64 result.

    The LOOCV argmin can land on a neighboring alpha gridpoint in f32; the
    MF score itself must stay tight (BASELINE north star <= 1e-5 relative).
    """
    x, abscf, alphas = problem
    m = np.asarray(mfmod.valid_mask(x))
    with jax.enable_x64(True):
        res64 = mfmod.matched_filter_columns(
            x.astype(np.float64), m, abscf, alphas)
        mf64 = np.asarray(res64.mf)
    res32 = mfmod.matched_filter_columns(
        x.astype(np.float32), m.astype(np.float32),
        abscf.astype(np.float32), alphas.astype(np.float32))
    mf32 = np.asarray(res32.mf)
    scale = np.abs(mf64).max()
    assert np.abs(mf32 - mf64).max() / scale < 1e-2
    # alpha choice within one grid step
    assert np.abs(np.asarray(res32.alpha_index) - np.asarray(res64.alpha_index)).max() <= 2


def test_all_invalid_column(rng):
    x = np.abs(rng.normal(size=(30, 3, 8))) + 1.0
    x[:, 1, 0] = -5.0  # entire column invalid
    abscf = -np.abs(rng.normal(size=8))
    alphas = mfmod.default_alphas()
    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns(x, m, abscf, alphas)
    assert np.asarray(res.n)[1] == 0
    assert (np.asarray(res.mf)[:, 1] == 0).all()


def test_column_stats(rng):
    mf = rng.normal(size=(40, 4))
    m = np.ones((40, 4), bool)
    m[:, 2] = False
    n, avg, std = mfmod.mf_column_stats(
        jax.numpy.asarray(mf), jax.numpy.asarray(m))
    assert np.asarray(n)[2] == -9999
    np.testing.assert_allclose(np.asarray(avg)[0], mf[:, 0].mean(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(std)[1], mf[:, 1].std(), rtol=1e-5)


def oracle_cluster_fit(Icol, kmask, abscf, alphas, nuse_full,
                       reflectance=False, I_reg=None):
    """The reference's per-cluster fit (robust_mf.py:339-386): moments
    from the CLUSTER rows, but looshrinkage's n = the FULL column count
    (robust_mf.py:355-356 passes ``nuse``)."""
    Icol_ki = Icol[kmask].astype(np.float64)
    mu = Icol_ki.mean(axis=0)
    I_zm = Icol_ki - mu
    B = Icol.shape[1]
    s = 100.0
    X = I_zm * s
    S = np.cov(X.T, ddof=1)
    T = np.diag(np.diag(S)) if I_reg is None else np.cov((I_reg * s).T,
                                                         ddof=1)
    nll = np.full(len(alphas), np.inf)
    nchanlog2pi = B * np.log(2 * np.pi)
    for i, a in enumerate(alphas):
        beta = (1 - a) / (nuse_full - 1.0)
        G = nuse_full * (beta * S) + a * T
        sign, logdet = np.linalg.slogdet(G)
        if sign <= 0:
            continue
        r_k = (X @ np.linalg.inv(G) * X).sum(axis=1)
        q = 1 - beta * r_k
        if (q <= 0).any():
            continue
        nll[i] = (0.5 * (nchanlog2pi + logdet)
                  + (np.log(q) + r_k / q).sum() / (2 * nuse_full))
    mindex = int(np.argmin(nll))
    alpha = alphas[mindex] if np.isfinite(nll[mindex]) else 0.0
    S = np.cov(I_zm.T, ddof=1)
    T = np.diag(np.diag(S)) if I_reg is None else np.cov(I_reg.T, ddof=1)
    Cov = (1 - alpha) * S + alpha * T
    Cinv = np.linalg.inv(Cov)
    target = (abscf - mu) if reflectance else (abscf * mu)
    mf = (I_zm @ Cinv @ target) / (target @ Cinv @ target)
    return mf, mindex


@pytest.mark.parametrize("regfull", [False, True])
def test_parity_multimodal_cluster_nuse(problem, regfull):
    """Per-cluster fits must use the FULL-COLUMN nuse in the LOOCV
    (reference: robust_mf.py:355-356) while moments come from the
    cluster rows — the n_loo threading in matched_filter_columns."""
    x, abscf, alphas = problem
    L, C, B = x.shape
    m = np.asarray(mfmod.valid_mask(x))
    # deterministic pseudo-clusters: alternate valid rows per column
    order = np.cumsum(m, axis=0) - 1            # rank among valid rows
    labels = (order % 2).astype(np.int32)

    n_full = m.sum(axis=0).astype(np.float64)
    Tfull = None
    if regfull:
        with jax.enable_x64(True):
            Tfull = mfmod.masked_moments(
                jax.numpy.where(jax.numpy.asarray(m)[:, :, None],
                                x.astype(np.float64), 0.0),
                jax.numpy.asarray(m.astype(np.float64)))[2]

    for k in (0, 1):
        mask_k = m & (labels == k)
        with jax.enable_x64(True):
            res = mfmod.matched_filter_columns(
                x.astype(np.float64), mask_k.astype(np.float64), abscf,
                alphas, T=Tfull, n_loo=jax.numpy.asarray(n_full))
        mf = np.asarray(res.mf)
        aidx = np.asarray(res.alpha_index)
        for c in range(C):
            use = np.where(m[:, c])[0]
            kmask_use = labels[use, c] == k
            if kmask_use.sum() < 3:
                continue
            Icol = x[use, c, :]
            I_reg = None
            if regfull:
                Icol64 = Icol.astype(np.float64)
                I_reg = Icol64 - Icol64[kmask_use].mean(axis=0)
            ref_mf, ref_idx = oracle_cluster_fit(
                Icol, kmask_use, abscf, alphas, float(len(use)),
                I_reg=I_reg)
            assert aidx[c] == ref_idx
            got = mf[use, c][kmask_use]
            np.testing.assert_allclose(got, ref_mf, rtol=1e-5, atol=1e-7)
