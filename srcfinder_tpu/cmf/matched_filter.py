"""Columnwise robust matched filter — the TPU-native science kernel.

Re-design of the reference CMF (reference: cmf/robust_mf.py) for XLA/TPU.
The reference processes one detector column at a time and, inside each
column, sweeps 201 shrinkage coefficients, each paying a dense
``det`` + ``inv`` of the (B, B) covariance (robust_mf.py:92-136
``looshrinkage``, :297-397 column loop). That is ~201 LAPACK
factorizations per column x ~600 columns, executed serially on the host.

TPU-first reformulation (all columns batched, one factorization each):

With shrinkage target ``T = diag(diag(S))`` (robust_mf.py:99), write
``D = sqrt(diag(S))`` and the correlation matrix ``R = D^-1 S D^-1``.
Then for every alpha in Theiler's closed-form LOOCV (Theiler, "The
Incredible Shrinking Covariance Estimator", Proc. SPIE 2012, eq. 29):

    G_a   = n*beta*S + alpha*T          (beta = (1-alpha)/(n-1))
          = D (n*beta*R + alpha*I) D
    logdet G_a = 2*sum(log d) + sum_i log(n*beta*lam_i + alpha)
    r_k(a) = z_k^T diag(1/(n*beta*lam + alpha)) z_k,   z_k = V^T D^-1 x_k

where ``R = V diag(lam) V^T`` is a single symmetric eigendecomposition per
column. The whole alpha sweep collapses to elementwise ops on eigenvalues
plus ONE matmul ``r = Z^2 @ W`` of shape (L,B)@(B,A) per column — MXU work,
no per-alpha factorizations. The final covariance
``C = (1-a)S + a*T = D((1-a)R + aI)D`` (robust_mf.py:129-134) shares the
same eigenbasis, so the matched-filter solve is free.

The reference's ``stability_scaling = 100`` (robust_mf.py:94) scales the
nll by a constant independent of alpha (logdet shifts by 2*B*log(s); r_k
and q are scale-invariant), so it cannot change the argmin; it exists only
to keep ``det`` inside float range — irrelevant once det is computed as a
log-sum — and is therefore dropped.

Ragged columns (per-column valid-pixel subsets, robust_mf.py:282) are
handled with mask-weighted moments on fixed shapes instead of gather/
scatter, keeping everything jit-compatible and shardable with shard_map.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PPM_SCALING", "ACTIVE_RANGES", "default_alphas", "valid_mask",
    "masked_moments", "MFResult", "matched_filter_columns", "mf_column_stats",
]


def _einsum(*args, **kw):
    """einsum pinned to full-f32 accumulation. On TPU the default matmul
    precision lowers f32 contractions to bfloat16 MXU passes, which moves
    the MF by ~4e-2 relative (measured on hardware) — far outside the
    characterized f32 envelope (tests/test_cmf_f32.py). HIGHEST restores
    the CPU-f32 numerics at negligible cost for these (B=72) shapes."""
    kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    return jnp.einsum(*args, **kw)

#: matched-filter score -> ppm*m (reference: robust_mf.py:38)
PPM_SCALING = 100000.0

#: active channel windows, 1-based inclusive-exclusive as in the reference
#: (reference: robust_mf.py:185-194)
ACTIVE_RANGES = {
    ("ch4", False): (351, 422),
    ("ch4", True): (5, 420),     # reflectance
    ("co2", False): (309, 391),
}


def default_alphas(dtype=np.float64) -> np.ndarray:
    """alpha grid 10^(-10..0) step 0.05 -> 201 points
    (reference: robust_mf.py:242-243)."""
    astep, aminexp, amaxexp = 0.05, -10.0, 0.0
    return (10.0 ** np.arange(aminexp, amaxexp + astep, astep)).astype(dtype)


def valid_mask(x):
    """Rows usable for covariance: all active bands finite and non-negative
    (reference: robust_mf.py:282 ``useidx``).

    x: (..., B) -> bool (...)
    """
    return jnp.all(jnp.isfinite(x) & ~(x < 0), axis=-1)


def masked_moments(x, m, eps=1e-30):
    """Mask-weighted mean and ddof=1 covariance per column.

    x: (L, C, B), m: (L, C) in {0,1}
    returns n: (C,), mu: (C, B), S: (C, B, B)

    Matches ``cov`` with matlab ddof=1 semantics (reference:
    robust_mf.py:52-70) on the valid-row subset. Uses the two-pass centered
    form for numerical stability.
    """
    dt = x.dtype
    m = m.astype(dt)
    n = m.sum(axis=0)                                     # (C,)
    mu = _einsum("lc,lcb->cb", m, x) / jnp.maximum(n, 1.0)[:, None]
    xc = (x - mu[None, :, :]) * m[:, :, None]
    S = _einsum("lcb,lcd->cbd", xc, xc) / jnp.maximum(n - 1.0, 1.0)[:, None, None]
    return n, mu, S


class MFResult(NamedTuple):
    mf: jax.Array          # (L, C) matched-filter scores (ppm*m if radiance)
    alpha_index: jax.Array  # (C,) argmin index into alphas (-1 => fallback)
    nll: jax.Array         # (C, A) LOOCV negative log likelihoods
    mu: jax.Array          # (C, B) background means
    n: jax.Array           # (C,) valid-pixel counts
    cond: jax.Array        # (C,) lam_min/lam_max of the whitened cov —
    #                        f32 is trustworthy down to cond ~1e-6; below
    #                        that run the f64 CPU path (see PARITY.md L2)


def _loo_nll(lam, Z, logdiag, n, m, alphas, nchan):
    """Theiler eq.29 LOOCV nll for all alphas at once, in the eigenbasis.

    lam:     (C, B) eigenvalues of the whitened covariance
    Z:       (L, C, B) whitened, rotated, zero-mean data
    logdiag: (C, B) log of the whitener diagonal (log d, or log diag(cholT))
    n:       (C,) the count used for beta=(1-a)/(n-1), G=n*beta*S+a*T and
             the 1/(2n) normalization — the FULL-COLUMN valid count even
             for cluster fits (the reference passes ``nuse`` into
             looshrinkage for every cluster, robust_mf.py:355-356,:110)
    m:       (L, C) the rows actually summed (the cluster mask)
    alphas:  (A,)
    returns nll: (C, A)
    """
    dt = Z.dtype
    A = alphas.shape[0]
    beta = (1.0 - alphas)[None, :] / jnp.maximum(n - 1.0, 1.0)[:, None]  # (C, A)
    nb = n[:, None] * beta                                                # (C, A)
    # eigenvalues of G_a in the whitened basis: n*beta*lam_i + alpha
    glam = nb[:, None, :] * lam[:, :, None] + alphas[None, None, :]       # (C, B, A)
    glam_ok = jnp.all(glam > 0, axis=1)                                   # (C, A)
    safe_glam = jnp.where(glam > 0, glam, 1.0)
    logdet = (2.0 * jnp.sum(logdiag, axis=1)[:, None]
              + jnp.sum(jnp.log(safe_glam), axis=1))                      # (C, A)

    # r_k(a) = sum_i Z_ki^2 / glam_ia  -> one MXU matmul per column
    r = _einsum("lcb,cba->lca", Z * Z, 1.0 / safe_glam)                # (L, C, A)
    q = 1.0 - beta[None, :, :] * r                                        # (L, C, A)
    q_ok = jnp.all(jnp.where(m[:, :, None] > 0, q > 0, True), axis=0)     # (C, A)
    safe_q = jnp.where(q > 0, q, 1.0)
    per = jnp.log(safe_q) + r / safe_q                                    # (L, C, A)
    ssum = _einsum("lc,lca->ca", m.astype(dt), per)                    # (C, A)

    nchanlog2pi = nchan * jnp.log(2.0 * jnp.asarray(np.pi, dt))
    nll = 0.5 * (nchanlog2pi + logdet) + ssum / (2.0 * jnp.maximum(n, 1.0))[:, None]
    return jnp.where(glam_ok & q_ok, nll, jnp.inf)


@functools.partial(jax.jit, static_argnames=("model", "reflectance"))
def matched_filter_columns(x, m, abscf, alphas, model: str = "looshrinkage",
                           reflectance: bool = False, T=None, moments=None,
                           n_loo=None):
    """Robust matched filter over all columns simultaneously.

    x:      (L, C, B) active-window radiance (columns = detector samples)
    m:      (L, C) valid mask (see :func:`valid_mask`)
    abscf:  (B,) target gas signature (column 3 of the unit-absorption
            library over the active window, reference: robust_mf.py:237-238)
    alphas: (A,) shrinkage grid (ignored for model='empirical')
    T:      optional (C, B, B) full shrinkage target (the reference's
            ``regfull`` path passes the full-column covariance as
            regularizer, robust_mf.py:99, :353-356); default None uses
            ``diag(diag(S))``.
    n_loo:  optional (C,) sample count for the LOOCV formula. The
            reference passes the FULL-COLUMN valid count into
            looshrinkage even for per-cluster fits (robust_mf.py:355-356)
            — the multimodal driver threads it here; default None uses
            the per-mask count (the unimodal case, where they coincide).

    Returns :class:`MFResult`. ``mf`` is in MF-score units; multiply by
    ``PPM_SCALING`` for ppm*m in radiance mode (done by the caller exactly
    as robust_mf.py:386 does). Invalid pixels have mf=0 and must be stamped
    with nodata by the caller (robust_mf.py:266).
    """
    dt = x.dtype
    L, C, B = x.shape
    # zero out invalid rows with where (not multiplication: NaN * 0 = NaN)
    mbool = m.astype(bool)
    x = jnp.where(mbool[:, :, None], x, 0.0)
    # ``moments``: optionally precomputed (n, mu, S)
    n, mu, S = masked_moments(x, m) if moments is None else moments
    ok = n >= 2.0                                                  # need ddof=1

    if T is None:
        # whitener = D = sqrt(diag(S)); whitened covariance = correlation
        diag = jnp.diagonal(S, axis1=1, axis2=2)                   # (C, B)
        d = jnp.sqrt(jnp.maximum(diag, 1e-30))                     # (C, B)
        Rw = S / (d[:, :, None] * d[:, None, :])
        lam, V = jnp.linalg.eigh(Rw)                               # (C,B),(C,B,B)
        Wmat = V / d[:, :, None]                                   # D^-1 V
        logdiag = jnp.log(jnp.maximum(d, 1e-300))
    else:
        # whitener = chol(T); whitened covariance M = Lc^-1 S Lc^-T
        Lc = jnp.linalg.cholesky(T + 1e-12 * jnp.eye(B, dtype=dt))
        LiS = jax.scipy.linalg.solve_triangular(Lc, S, lower=True)
        M = jax.scipy.linalg.solve_triangular(
            Lc, LiS.swapaxes(-1, -2), lower=True).swapaxes(-1, -2)
        M = 0.5 * (M + M.swapaxes(-1, -2))
        lam, V = jnp.linalg.eigh(M)
        # Wmat = Lc^-T V so that z = Wmat^T x is the whitened rotation
        Wmat = jax.scipy.linalg.solve_triangular(
            Lc.swapaxes(-1, -2), V, lower=False)
        logdiag = jnp.log(jnp.maximum(
            jnp.diagonal(Lc, axis1=1, axis2=2), 1e-300))

    xc = (x - mu[None, :, :]) * m[:, :, None]                      # zero-mean valid
    Z = _einsum("lcb,cbk->lck", xc, Wmat)                       # (L, C, B)

    if model == "looshrinkage":
        nll = _loo_nll(lam, Z, logdiag, n if n_loo is None else n_loo,
                       m, alphas, B)                               # (C, A)
        mindex = jnp.argmin(nll, axis=1)                           # (C,)
        has_min = jnp.isfinite(jnp.min(nll, axis=1))
        alpha = jnp.where(has_min, alphas[mindex], 0.0)            # fallback a=0
        mindex = jnp.where(has_min, mindex, -1)
    elif model == "empirical":
        alpha = jnp.zeros((C,), dt)
        mindex = jnp.zeros((C,), jnp.int32)
        nll = jnp.zeros((C, alphas.shape[0]), dt)
    else:
        raise ValueError(f"unknown model {model!r}")

    # final covariance C = (1-a)S + aT shares the eigenbasis:
    # C^-1 = Wmat diag(1/((1-a)lam + a)) Wmat^T
    clam = (1.0 - alpha)[:, None] * lam + alpha[:, None]           # (C, B)
    clam = jnp.where(clam > 1e-30, clam, 1e-30)

    # target: t = abscf * mu (radiance) or abscf - mu (reflectance)
    # (reference: robust_mf.py:378-379)
    t = (abscf[None, :] - mu) if reflectance else (abscf[None, :] * mu)
    tw = _einsum("cb,cbk->ck", t, Wmat)                         # Wmat^T t
    # normalizer = t^T C^-1 t
    normalizer = jnp.sum(tw * tw / clam, axis=1)                   # (C,)
    # y = C^-1 t in the whitened basis applied to Z: mf_l = Z_l . (tw/clam)
    y = tw / clam                                                  # (C, B)
    mf = _einsum("lck,ck->lc", Z, y) / jnp.maximum(normalizer, 1e-300)[None, :]

    mf = jnp.where(m > 0, mf, 0.0) * jnp.where(ok, 1.0, 0.0)[None, :]
    cond = jnp.clip(lam[:, 0], 0.0) / jnp.maximum(lam[:, -1], 1e-300)
    return MFResult(mf=mf, alpha_index=mindex, nll=nll, mu=mu,
                    n=n.astype(jnp.int32), cond=cond)


class MFMultimodalResult(NamedTuple):
    mf: jax.Array            # (L, C)
    valid: jax.Array         # (L, C) bool: pixel has an (unrejected) estimate
    labels: jax.Array        # (L, C) int32 cluster ids
    alpha_pix: jax.Array     # (L, C) int32 per-pixel chosen alpha index
    rejected: jax.Array      # (C, K) bool rejected clusters
    cond: jax.Array          # (C, K) per-mode correlation condition number
    counts: jax.Array        # (C, K) per-mode valid-pixel counts


def matched_filter_columns_multimodal(x, m, abscf, alphas, bgmodes: int,
                                      pcadim: int = 6, reject: bool = False,
                                      regfull: bool = False,
                                      model: str = "looshrinkage",
                                      reflectance: bool = False,
                                      kmeans_iters: int = 25, seed: int = 0):
    """Multimodal background MF: PCA + k-means column partitions, one
    covariance model per (column, mode) (reference: robust_mf.py:306-397).

    Rejection semantics: clusters with fewer than
    ``int((nbands - 1) * 1.2)`` samples are rejected when ``reject`` is
    set (robust_mf.py:199-200 computes int((active[1]-active[0])*1.2),
    one less than the band count, :321-324); rejected clusters' pixels
    carry no estimate (they stay nodata in the written image). If every
    cluster in a column is rejected, rejection is disabled for that
    column (robust_mf.py:330-332).

    Recorded deviations from the reference in reject mode:
    (a) the reference cannot reject cluster id 0 (it flips the label
    sign, and -0 == 0, robust_mf.py:322); we treat cluster 0 like any
    other; (b) the reference's ki<0 pass computes a POOLED estimate
    over all non-rejected pixels and writes it to those pixels
    (kmask = bglabels>=0, robust_mf.py:340,:381-386) — because
    np.unique sorted labels BEFORE the sign flip, a rejected cluster
    with the highest label id runs last and that pooled estimate
    overwrites every positive mode's refined output. We keep each
    mode's own estimate instead (the order-independent reading of the
    documented intent); outputs therefore differ from the reference
    whenever the rejected cluster is not label 0 or the smallest id.

    Parity preserved: every cluster's looshrinkage uses the FULL-COLUMN
    valid count for beta/(2n) (robust_mf.py:355-356) while moments come
    from the cluster rows — threaded via ``n_loo``.

    ``regfull`` shrinks toward the full-column covariance instead of the
    diagonal (robust_mf.py:353-356; note cov() re-centers, so the
    reference's ``Icol - mu_mode`` regularizer equals the full-column
    covariance regardless of the mode mean).
    """
    from .kmeans import masked_pca_project, kmeans_columns

    mbool = m.astype(bool)
    x = jnp.where(mbool[:, :, None], x, 0.0)
    L, C, B = x.shape
    z = masked_pca_project(x, m, pcadim)
    labels, _ = kmeans_columns(z, m, bgmodes, iters=kmeans_iters, seed=seed)

    # int((active[1]-active[0]) * 1.2) in the reference = one less than
    # the band count (robust_mf.py:199-200)
    bgminsamp = int((B - 1) * 1.2)
    onehot = (jax.nn.one_hot(labels, bgmodes, dtype=x.dtype)
              * m[:, :, None].astype(x.dtype))                     # (L, C, K)
    cnt = onehot.sum(axis=0)                                       # (C, K)
    rej = (cnt < bgminsamp) if reject else jnp.zeros_like(cnt, bool)
    # columns where all modes rejected: proceed without rejection
    all_rej = rej.all(axis=1)
    rej = rej & ~all_rej[:, None]

    Tfull = masked_moments(x, m)[2] if regfull else None
    n_full = m.astype(x.dtype).sum(axis=0)        # the reference's nuse

    mf = jnp.zeros((L, C), x.dtype)
    alpha_pix = jnp.full((L, C), -1, jnp.int32)
    valid = jnp.zeros((L, C), bool)
    conds = []
    for k in range(bgmodes):
        mask_k = mbool & (labels == k)
        res_k = matched_filter_columns(x, mask_k.astype(x.dtype), abscf,
                                       alphas, model=model,
                                       reflectance=reflectance, T=Tfull,
                                       n_loo=n_full)
        use_k = mask_k & ~rej[:, k][None, :]
        mf = jnp.where(use_k, res_k.mf, mf)
        alpha_pix = jnp.where(use_k, res_k.alpha_index[None, :], alpha_pix)
        valid = valid | use_k
        conds.append(res_k.cond)

    return MFMultimodalResult(mf=mf, valid=valid, labels=labels,
                              alpha_pix=alpha_pix, rejected=rej,
                              cond=jnp.stack(conds, axis=1), counts=cnt)


def mf_column_stats(mf_ppmm, m, nodata=-9999.0):
    """Per-column npix/avg/std of the MF image over valid pixels
    (reference: robust_mf.py:388-392, columns with no valid pixels keep
    nodata)."""
    m = m.astype(mf_ppmm.dtype)
    n = m.sum(axis=0)
    ok = n > 0
    avg = _einsum("lc,lc->c", m, mf_ppmm) / jnp.maximum(n, 1.0)
    var = _einsum("lc,lc->c", m, (mf_ppmm - avg[None, :]) ** 2) / jnp.maximum(n, 1.0)
    std = jnp.sqrt(var)
    return (jnp.where(ok, n, nodata),
            jnp.where(ok, avg, nodata),
            jnp.where(ok, std, nodata))
