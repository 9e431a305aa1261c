"""Fused masked-moments Pallas kernel for the columnwise matched filter.

The CMF background model needs, per detector column: the valid-pixel
count, masked mean, and masked scatter matrix of the active-band spectra
(reference: cmf/robust_mf.py:282 ``useidx`` + :297-356 per-column mean/
cov). The XLA path (:func:`srcfinder_tpu.cmf.matched_filter.
masked_moments`) materializes the mask, the zeroed cube, and the centered
cube — several HBM round-trips over the ~0.5 GB active window.

This kernel streams line blocks through VMEM once, fusing validity
testing (finite AND non-negative across bands), masking, and both moment
accumulations (sum and outer-product scatter on the MXU) into a single
pass. Accumulation is performed about a caller-supplied per-column
``shift`` (an approximate mean) so the final covariance subtraction
cancels only the small residual — keeping f32 accurate where a naive
one-pass sum-of-squares would lose ~1e-5 relative.

Grid: (column blocks, line blocks); the line axis is a reduction — the
output accumulators are revisited across it (index maps constant along
that axis) and initialized at the first iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_moments_pallas"]


def _kernel(x_ref, shift_ref, cnt_ref, s1_ref, s2_ref):
    lblk = pl.program_id(1)
    x = x_ref[:]                                   # (Lt, Ct, B)
    dt = x.dtype
    # validity via keepdims reductions (Mosaic-friendly layouts: no
    # squeeze-then-broadcast relayout of the (Lt, Ct) mask)
    bad = (~jnp.isfinite(x)) | (x < 0)
    badcnt = jnp.sum(bad.astype(dt), axis=-1, keepdims=True)  # (Lt, Ct, 1)
    validf = jnp.where(badcnt == 0, jnp.ones((), dt), jnp.zeros((), dt))
    xm = jnp.where(badcnt == 0, x - shift_ref[:][None], 0.0)
    cnt = jnp.sum(validf, axis=0)                             # (Ct, 1)
    s1 = jnp.sum(xm, axis=0)                                  # (Ct, B)
    # batched outer-product accumulation on the MXU: for each column c,
    # s2[c] += xm[:, c, :]^T @ xm[:, c, :]   (Mosaic requires the batch
    # dimension leading, hence the transpose to (Ct, Lt, B))
    xt = jnp.transpose(xm, (1, 0, 2))
    s2 = jax.lax.dot_general(
        xt, xt,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dt)                           # (Ct, B, B)

    @pl.when(lblk == 0)
    def _():
        cnt_ref[:] = cnt
        s1_ref[:] = s1
        s2_ref[:] = s2

    @pl.when(lblk > 0)
    def _():
        cnt_ref[:] = cnt_ref[:] + cnt
        s1_ref[:] = s1_ref[:] + s1
        s2_ref[:] = s2_ref[:] + s2


@functools.partial(jax.jit,
                   static_argnames=("line_block", "col_block", "interpret"))
def _moments_call(x, shift, line_block: int, col_block: int,
                  interpret: bool):
    L, C, B = x.shape
    grid = (pl.cdiv(C, col_block), pl.cdiv(L, line_block))
    cnt, s1, s2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((line_block, col_block, B),
                         lambda c, l: (l, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_block, B), lambda c, l: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((col_block, 1), lambda c, l: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_block, B), lambda c, l: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((col_block, B, B), lambda c, l: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 1), x.dtype),
            jax.ShapeDtypeStruct((C, B), x.dtype),
            jax.ShapeDtypeStruct((C, B, B), x.dtype),
        ],
        interpret=interpret,
    )(x, shift)
    return cnt[:, 0], s1, s2


def masked_moments_pallas(x, shift=None, line_block: int = 256,
                          col_block: int = 8, interpret=None):
    """Fused single-pass masked moments.

    x: (L, C, B) radiance (invalid rows contain ANY negative/nonfinite
    band); shift: optional (C, B) accumulation center (defaults to the
    column means of a strided line subsample).

    Returns (n, mu, S) matching
    :func:`srcfinder_tpu.cmf.matched_filter.masked_moments` semantics
    (ddof=1).

    Padding note: out-of-range line/column blocks are zero-padded by
    Pallas; all-zero rows count as "valid" (zeros are finite and
    non-negative) within padded LINE blocks, so L must be handled
    exactly — the wrapper pads L with NaN rows instead (NaN rows are
    invalid and contribute nothing). The column axis may be padded
    freely (padded columns are sliced away).
    """
    L, C, B = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if shift is None:
        stride = max(1, L // 64)
        sub = jnp.nan_to_num(x[::stride], nan=0.0, posinf=0.0, neginf=0.0)
        shift = jnp.mean(jnp.maximum(sub, 0.0), axis=0)      # (C, B)
    shift = shift.astype(x.dtype)

    pad_l = (-L) % line_block
    pad_c = (-C) % col_block
    if pad_l:
        x = jnp.concatenate(
            [x, jnp.full((pad_l, C, B), jnp.nan, x.dtype)], axis=0)
    if pad_c:
        x = jnp.concatenate(
            [x, jnp.full((x.shape[0], pad_c, B), jnp.nan, x.dtype)],
            axis=1)
        shift = jnp.concatenate(
            [shift, jnp.zeros((pad_c, B), x.dtype)], axis=0)

    cnt, s1, s2 = _moments_call(x, shift, line_block, col_block,
                                bool(interpret))
    cnt, s1, s2 = cnt[:C], s1[:C], s2[:C]

    n = cnt
    delta = s1 / jnp.maximum(n, 1.0)[:, None]                # mu - shift
    mu = shift[:C] + delta
    S = (s2 - n[:, None, None] * delta[:, None, :] * delta[:, :, None]) \
        / jnp.maximum(n - 1.0, 1.0)[:, None, None]
    return n, mu, S
