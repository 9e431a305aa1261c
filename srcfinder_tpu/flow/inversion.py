"""TROPOMI flux inversion (toy) — OLS and Bayesian forms, on device.

Reference (msf_flow/deployment/inversion-run/lambda_function.py:196-205):
x_hat = (H^T H)^-1 H^T (y - background) with background 1860 ppb;
Bayesian Rodgers-2000 form (inversion-run.py:61-116, also commented in
the Lambda): x_hat = x_a + S_a H^T (H S_a H^T + S_o)^-1 (y - H x_a).
Background estimation takes the 5th percentile per overpass time
(inversion-background.py:28-44).

These are dense linear-algebra solves — natural jit/MXU work (the
reference used scipy.sparse/SuperLU on the host).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ols_inversion", "bayesian_inversion", "posterior_covariance",
           "background_percentile"]


@jax.jit
def ols_inversion(H, y, background=1860.0):
    """x_hat = (H^T H)^-1 H^T (y - background); solved via Cholesky on the
    normal equations (reference: inversion-run lambda_function.py:196-205).
    Matmul precision pinned to full f32: the TPU default lowers f32
    products to bf16 MXU passes (see cmf/matched_filter._einsum).
    """
    with jax.default_matmul_precision("highest"):
        H = jnp.asarray(H)
        rhs = H.T @ (jnp.asarray(y) - background)
        A = H.T @ H
        # small ridge keeps the toy problem solvable when columns are empty
        A = A + 1e-9 * jnp.eye(A.shape[0], dtype=A.dtype)
        c, lower = jax.scipy.linalg.cho_factor(A)
        return jax.scipy.linalg.cho_solve((c, lower), rhs)


@jax.jit
def bayesian_inversion(H, y, x_a, S_a, S_o):
    """Rodgers (2000) linear-Gaussian posterior mean:
    x_hat = x_a + S_a H^T (H S_a H^T + S_o)^-1 (y - H x_a)
    (reference: inversion-run.py:61-116). Matmul precision pinned to
    full f32 (see cmf/matched_filter._einsum)."""
    with jax.default_matmul_precision("highest"):
        H = jnp.asarray(H)
        x_a = jnp.asarray(x_a)
        K = H @ jnp.asarray(S_a) @ H.T + jnp.asarray(S_o)
        resid = jnp.asarray(y) - H @ x_a
        c, lower = jax.scipy.linalg.cho_factor(K)
        return x_a + jnp.asarray(S_a) @ H.T @ jax.scipy.linalg.cho_solve(
            (c, lower), resid)


@jax.jit
def posterior_covariance(H, S_a, S_o):
    """Rodgers posterior covariance
    S_hat = (H^T S_o^-1 H + S_a^-1)^-1
    (reference: inversion-run.py:92-97 via sparse spsolve/inv).
    Matmul precision pinned to full f32 (see cmf/matched_filter._einsum).
    """
    with jax.default_matmul_precision("highest"):
        H = jnp.asarray(H)
        S_a = jnp.asarray(S_a)
        S_o = jnp.asarray(S_o)
        A = H.T @ jnp.linalg.solve(S_o, H) + jnp.linalg.inv(S_a)
        return jnp.linalg.inv(A)


def background_percentile(values, times, q: float = 5.0):
    """Per-overpass-time background as the q-th percentile
    (reference: inversion-background.py:28-44)."""
    values = np.asarray(values, np.float64)
    times = np.asarray(times)
    out = {}
    for t in np.unique(times):
        sel = values[times == t]
        sel = sel[np.isfinite(sel)]
        out[t] = float(np.percentile(sel, q)) if sel.size else np.nan
    return out
