"""Fused GoogLeNet stage-1+2 Pallas kernel for the exact sliding-window
CNN.

Why: the exact path (detect.cnn_pipeline, reference semantics of
cnn/cnn_pred_pipeline.py — one 256x256 zero-padded crop classified per
pixel) is HBM-bandwidth-bound on the v5e: the per-window early feature
maps dominate the traffic (conv1 output alone is 2 MB bf16 per window,
written and re-read = ~21% of all bytes; conv1..conv3 together ~47%).
XLA materializes every conv output in HBM — conv->pool->conv chains do
not fuse. This kernel keeps the whole pre-inception trunk of ONE window
resident in VMEM:

    window (D, D, 1)
      -> conv1 7x7/2 pad 3 + bias + ReLU          (D/2, D/2, 64)
      -> ceil-mode maxpool 3x3/2                  (D/4, D/4, 64)
      -> conv2 1x1 + bias + ReLU                  (D/4, D/4, 64)
      -> conv3 3x3 pad 1 + bias + ReLU            (D/4, D/4, 192)
      -> ceil-mode maxpool 3x3/2 (pool2)          (D/8, D/8, 192)

writing only the pooled stage-3 input (GoogLeNet.__call__(
start_stage=3, start_pooled=True) resumes from it).
Weights are the BN-folded inference parameters (fold_inference).

Kernel construction notes (see /opt/skills/guides/pallas_guide.md):
- grid = (B,): one program per window; the Pallas pipeline double-
  buffers the (1, D, D, 1) input block and the (1, D/8, D/8, 192)
  output block between HBM and VMEM automatically.
- conv1 is im2col + one MXU dot ((D/2*D/2, 49) @ (49, 64)); strided
  patch extraction uses reshape-and-take (stride-2 slicing lowers
  poorly in Mosaic).
- conv3 is 9 shifted matmuls accumulating in f32 — no im2col buffer
  (a (D/4*D/4, 576) patch matrix would not fit VMEM at D=256 next to
  the rest of the working set).
- ceil-mode pooling pads bottom/right with -inf (exact torch ceil_mode
  semantics, matching models.googlenet._ceil_maxpool).
- dots run in the input dtype with preferred_element_type=f32 —
  identical to what XLA emits for the bf16 model's convs.

Opt-in: detect.cnn_pipeline uses it when SRCFINDER_CNN_FUSED=1 until a
hardware bake-off against the pure-XLA scan decides the default (the
round-2 Pallas moments kernel was deleted for losing its bake-off;
this one must win on the chip or follow it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_stage12", "trunk_params_from_variables"]


def trunk_params_from_variables(variables):
    """Extract the stage-1+2 folded conv weights in kernel layout:
    (k1 (49, 64), b1 (1, 64), k2 (64, 64), b2 (1, 64),
    k3 (3, 3, 64, 192), b3 (1, 192)). ``variables`` must be the
    fold_inference tree (conv bias present, no BN)."""
    p = variables["params"]

    def kb(name):
        c = p[name]["conv"]
        if "bias" not in c:
            raise ValueError(
                "trunk_fuse needs BN-folded variables "
                "(models.googlenet.fold_inference)")
        return c["kernel"], c["bias"]

    k1, b1 = kb("conv1")        # (7, 7, 1, 64) HWIO
    k2, b2 = kb("conv2")        # (1, 1, 64, 64)
    k3, b3 = kb("conv3")        # (3, 3, 64, 192)
    return (jnp.asarray(k1).reshape(49, 64),
            jnp.asarray(b1).reshape(1, 64),
            jnp.asarray(k2).reshape(64, 64),
            jnp.asarray(b2).reshape(1, 64),
            jnp.asarray(k3),
            jnp.asarray(b3).reshape(1, 192))


def _stride2_rows(x):
    """x[0::2] on an even leading axis via reshape-and-take (strided
    slices lower poorly in Mosaic)."""
    h = x.shape[0]
    return x.reshape((h // 2, 2) + x.shape[1:])[:, 0]


def _stride2_2d(x):
    """x[0::2, 0::2] for an even-shaped 2-D array."""
    h, w = x.shape
    return x.reshape(h // 2, 2, w // 2, 2)[:, 0, :, 0]


def _ceil_pool3x3s2(x):
    """MaxPool2d(3, stride 2, ceil_mode=True) on (H, W, C), H == W
    even: out[o] = max(in[2o .. 2o+2]) with out-of-range taps ignored
    (-inf padding) — exact torch ceil_mode semantics
    (models.googlenet._ceil_maxpool)."""
    h, w, c = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.full((h + 2, w + 2, c), neg, x.dtype).at[:h, :w].set(x)
    rm = jnp.maximum(jnp.maximum(xp[0:h], xp[1:h + 1]), xp[2:h + 2])
    rm = _stride2_rows(rm)                               # (h//2, w+2, c)
    cm = jnp.maximum(jnp.maximum(rm[:, 0:w], rm[:, 1:w + 1]),
                     rm[:, 2:w + 2])
    return cm.reshape(h // 2, w // 2, 2, c)[:, :, 0]     # (h//2, w//2, c)


def _kernel(win_ref, k1_ref, b1_ref, k2_ref, b2_ref, k3_ref, b3_ref,
            out_ref):
    dt = win_ref.dtype
    d = win_ref.shape[1]
    h1 = d // 2                                    # conv1 output side
    h2 = d // 4                                    # pool1/conv2/3 side

    w = win_ref[0, :, :, 0]                        # (D, D)
    pad = jnp.zeros((d + 6, d + 6), dt).at[3:3 + d, 3:3 + d].set(w)

    # ---- conv1: im2col (h1*h1, 49) @ (49, 64), bias + ReLU ----------
    cols = []
    for ky in range(7):
        for kx in range(7):
            cols.append(_stride2_2d(pad[ky:ky + d, kx:kx + d]))
    patches = jnp.stack(cols, axis=-1).reshape(h1 * h1, 49)
    # dot in 4 row chunks: one (h1*h1, 64) f32 accumulator is the VMEM
    # peak of the whole kernel at D=256 (4.2 MB) — chunking keeps each
    # f32 partial at ~1 MB and the bf16 result is written in place
    b1f = b1_ref[0].astype(jnp.float32)
    nchunk = 4 if (h1 * h1) % 4 == 0 else 1
    rows_per = h1 * h1 // nchunk
    parts = []
    for ci in range(nchunk):
        acc = jax.lax.dot_general(
            patches[ci * rows_per:(ci + 1) * rows_per], k1_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        parts.append(jnp.maximum(acc + b1f, 0.0).astype(dt))
    c1 = jnp.concatenate(parts, axis=0).reshape(h1, h1, 64)

    # ---- ceil-mode maxpool 3x3/2 ------------------------------------
    p1 = _ceil_pool3x3s2(c1)                       # (h2, h2, 64)

    # ---- conv2 1x1 + bias + ReLU ------------------------------------
    acc2 = jax.lax.dot_general(
        p1.reshape(h2 * h2, 64), k2_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    c2 = jnp.maximum(acc2 + b2_ref[0].astype(jnp.float32), 0.0)
    c2 = c2.astype(dt).reshape(h2, h2, 64)

    # ---- conv3 3x3 pad 1: 9 shifted matmuls, f32 accumulator --------
    p2 = jnp.zeros((h2 + 2, h2 + 2, 64), dt).at[1:1 + h2, 1:1 + h2].set(c2)
    acc3 = jnp.zeros((h2 * h2, 192), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc3 = acc3 + jax.lax.dot_general(
                p2[dy:dy + h2, dx:dx + h2].reshape(h2 * h2, 64),
                k3_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    c3 = jnp.maximum(acc3 + b3_ref[0].astype(jnp.float32), 0.0)
    c3 = c3.astype(dt).reshape(h2, h2, 192)

    # ---- pool2 (stage 3's leading ceil-mode maxpool 3x3/2): emitting
    # the pooled map quarters the kernel's output traffic AND stage 3's
    # input reads; the model resumes with start_pooled=True ------------
    out_ref[0] = _ceil_pool3x3s2(c3)               # (h2//2, h2//2, 192)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stage12(wins, params, interpret: bool | None = None):
    """(B, D, D, 1) windows -> (B, D/8, D/8, 192): GoogLeNet conv1 ->
    ceil-pool -> conv2 -> conv3 -> ceil-pool (stages 1+2 AND stage 3's
    leading pool), BN folded, per-window VMEM-resident. ``params`` from
    :func:`trunk_params_from_variables`. D must be a multiple of 8.

    ``interpret=None``: interpreter on the CPU backend (the test
    suite), Mosaic-compiled otherwise (incl. the "axon" remote-TPU
    platform — NOT named "tpu", so test by exclusion)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, d, d2, _ = wins.shape
    if d != d2 or d % 8:
        raise ValueError(f"square windows with D % 8 == 0 required, "
                         f"got {wins.shape}")
    k1, b1, k2, b2, k3, b3 = (p.astype(wins.dtype) for p in params)
    h3 = d // 8

    def full(shape):
        return pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, d, d, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((49, 64)), full((1, 64)),
            full((64, 64)), full((1, 64)),
            full((3, 3, 64, 192)), full((1, 192)),
        ],
        out_specs=pl.BlockSpec((1, h3, h3, 192), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h3, h3, 192), wins.dtype),
        interpret=interpret,
    )(wins, k1, b1, k2, b2, k3, b3)
