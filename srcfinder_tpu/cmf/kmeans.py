"""Batched masked PCA + k-means for multimodal background estimation.

Reference behavior (cmf/robust_mf.py:306-332): per column, PCA-project the
zero-mean spectra to ``pcadim`` dims, MiniBatchKMeans into ``bgmodes``
clusters, then optionally reject clusters with fewer than
``bgminsamp = 1.2 * nbands`` samples.

TPU re-design: PCA is a batched eigh over all columns at once; clustering
is deterministic Lloyd's iteration (vectorized over columns) with
k-means++ seeding from a fixed PRNG key. MiniBatchKMeans is stochastic
SGD over minibatches, so bit-parity is impossible by construction; this
implementation converges to equivalent partitions deterministically.
Deviation from the reference recorded here: the reference takes
``evecs[:, :pcadim]`` from *unordered* scipy.linalg.eig output
(robust_mf.py:310-311); we take the top-``pcadim`` eigenvectors by
descending eigenvalue, which is the documented intent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["masked_pca_project", "kmeans_columns"]

# full-f32 accumulation: the TPU default lowers f32 contractions to bf16
# MXU passes, which can flip cluster assignments near Voronoi boundaries
# (see cmf/matched_filter._einsum for the measured MF-side drift)
from .matched_filter import _einsum


def masked_pca_project(x, m, pcadim: int):
    """Project each column's valid spectra onto its top principal axes.

    x: (L, C, B) data (invalid rows already zeroed), m: (L, C) mask
    returns z: (L, C, pcadim)
    """
    from .matched_filter import masked_moments
    n, mu, S = masked_moments(x, m)
    lam, V = jnp.linalg.eigh(S)                    # ascending eigenvalues
    Vtop = V[:, :, ::-1][:, :, :pcadim]            # (C, B, P) descending
    xc = (x - mu[None, :, :]) * m[:, :, None]
    return _einsum("lcb,cbp->lcp", xc, Vtop)


def _kpp_init(z, m, k, key):
    """k-means++ seeding, vectorized over columns.

    z: (L, C, P), m: (L, C) -> centroids (C, K, P)
    """
    L, C, P = z.shape
    keys = jax.random.split(key, k)
    # first centroid: random valid point (gumbel-max over mask)
    g = jax.random.gumbel(keys[0], (L, C))
    idx0 = jnp.argmax(jnp.where(m > 0, g, -jnp.inf), axis=0)      # (C,)
    cent = jnp.take_along_axis(z, idx0[None, :, None], axis=0)    # (1, C, P)
    cent = jnp.moveaxis(cent, 0, 1)                               # (C, 1, P)

    def add_centroid(cent, key_i):
        # distance to the nearest existing centroid OF THE SAME COLUMN:
        # z (L,C,1,P) vs cent (1,C,K',P) -> (L,C,K') -> min over K'
        d2 = jnp.min(jnp.sum((z[:, :, None, :] - cent[None]) ** 2,
                             axis=-1), axis=2)                    # (L, C)
        logits = jnp.where(m > 0, jnp.log(jnp.maximum(d2, 1e-30)), -jnp.inf)
        gi = jax.random.gumbel(key_i, (L, C))
        idx = jnp.argmax(logits + gi, axis=0)                     # (C,)
        newc = jnp.take_along_axis(z, idx[None, :, None], axis=0)
        return jnp.concatenate([cent, jnp.moveaxis(newc, 0, 1)], axis=1)

    for i in range(1, k):
        cent = add_centroid(cent, keys[i])
    return cent                                                    # (C, K, P)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_columns(z, m, k: int, iters: int = 25, seed: int = 0):
    """Lloyd's k-means per column on masked points.

    z: (L, C, P), m: (L, C)
    returns labels (L, C) int32 (garbage where ~m), centroids (C, K, P)
    """
    key = jax.random.PRNGKey(seed)
    cent = _kpp_init(z, m, k, key)                                 # (C, K, P)

    def step(cent, _):
        d2 = (jnp.sum(z * z, axis=-1)[:, :, None]
              - 2.0 * _einsum("lcp,ckp->lck", z, cent)
              + jnp.sum(cent * cent, axis=-1)[None])               # (L, C, K)
        lab = jnp.argmin(d2, axis=2)                               # (L, C)
        onehot = (jax.nn.one_hot(lab, k, dtype=z.dtype)
                  * m[:, :, None])                                 # (L, C, K)
        cnt = onehot.sum(axis=0)                                   # (C, K)
        sums = _einsum("lck,lcp->ckp", onehot, z)               # (C, K, P)
        newc = sums / jnp.maximum(cnt, 1.0)[:, :, None]
        # keep old centroid for empty clusters
        newc = jnp.where((cnt > 0)[:, :, None], newc, cent)
        return newc, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    d2 = (jnp.sum(z * z, axis=-1)[:, :, None]
          - 2.0 * _einsum("lcp,ckp->lck", z, cent)
          + jnp.sum(cent * cent, axis=-1)[None])
    labels = jnp.argmin(d2, axis=2).astype(jnp.int32)
    return labels, cent
