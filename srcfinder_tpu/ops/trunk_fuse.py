"""Fused GoogLeNet trunk segments (Pallas) for the exact sliding-window
CNN.

Why: the exact path (detect.cnn_pipeline, reference semantics of
cnn/cnn_pred_pipeline.py — one 256x256 zero-padded crop classified per
pixel) is HBM-bandwidth-bound on the v5e: XLA materializes every
conv/pool output in HBM per window (conv->pool->conv chains do not
fuse), so the per-window feature maps dominate the traffic. These
kernels keep a whole window's features resident in VMEM between the
trunk's stride-2 landmarks, writing only the segment boundary tensors:

    segment "s23" (per window): conv1 output (128, 128, 64)
        -> ceil-maxpool 3x3/2 -> conv2 1x1 -> conv3 3x3
        -> ceil-maxpool 3x3/2 -> inception3a -> inception3b
        -> ceil-maxpool 3x3/2 -> (16, 16, 480)
    segment "s45" (per window): (16, 16, 480)
        -> inception4a..4e -> maxpool 2/2 -> inception5a -> inception5b
        -> global average pool -> (1024,)

conv1 itself (7x7 stride 2) stays in XLA: its stride-2 im2col needs a
minor-dim insertion that this Mosaic version cannot lower (r4 bake-off
log, SCALING.md "Pallas verdict (r4)"), and XLA's native strided conv
is already near its roofline. Weights are the BN-folded inference
parameters (models.googlenet.fold_variables); inside VMEM the
fused-wide 1x1 trick buys nothing (the input is already resident), so
fused0 weights are split back into per-branch 1x1s on the host.

Kernel construction notes (all idioms probe-verified on the v5e this
round — see SCALING.md "Pallas verdict (r4)" for what does NOT lower):
- grid = (B,): one program per window; the Pallas pipeline double-
  buffers the input and output blocks between HBM and VMEM.
- every conv is shifted matmuls on the (h*w, cin) view: 3x3 = 9
  slices of the zero-padded 3-D map, each reshaped (h*w, cin) and
  accumulated into one f32 (h*w, cout) buffer. (h, w, c) <-> (h*w, c)
  reshapes are leading-dim merges/splits, which Mosaic lowers.
- stride-2 ceil-mode maxpool = -inf pad + shifted maxes + stride-2
  selection via reshape splits on the leading and sublane dims
  ((h,2,w,c)[:,0] / (h,w,2,c)[:,:,0]); NEVER strided slices or 2-D
  minor-dim reshapes (both fail Mosaic's layout inference).
- branch concats happen on the lane axis of the 2-D (h*w, c) views.
- dots run in the input dtype with preferred_element_type=f32 —
  identical to what XLA emits for the bf16 model's convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_trunk_segment", "trunk_segment_params", "SEGMENTS"]

#: inception channel plans (reference: cnn/archs/googlenet1.py:64-79):
#: name -> (ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj)
_INCEPTION = {
    "inception3a": (64, 96, 128, 16, 32, 32),
    "inception3b": (128, 128, 192, 32, 96, 64),
    "inception4a": (192, 96, 208, 16, 48, 64),
    "inception4b": (160, 112, 224, 24, 64, 64),
    "inception4c": (128, 128, 256, 24, 64, 64),
    "inception4d": (112, 144, 288, 32, 64, 64),
    "inception4e": (256, 160, 320, 32, 128, 128),
    "inception5a": (256, 160, 320, 32, 128, 128),
    "inception5b": (384, 192, 384, 48, 128, 128),
}

SEGMENTS = ("s23", "s45")


def _kb(p, name):
    c = p[name]["conv"]
    if "bias" not in c:
        raise ValueError("trunk kernels need BN-folded variables "
                         "(models.googlenet.fold_variables)")
    return jnp.asarray(c["kernel"]), jnp.asarray(c["bias"])


def _inception_params(p, name):
    """One block's folded weights as a flat list, splitting a ``fused0``
    wide 1x1 (models.googlenet.fuse_variables layout) back into the
    three per-branch 1x1s — inside VMEM the wide-read trick buys
    nothing, and per-branch weights keep the kernel free of lane-dim
    output slicing."""
    blk = p[name]
    ch1, red3, ch3, red5, ch5, proj = _INCEPTION[name]
    if "fused0" in blk:
        k, b = _kb(blk, "fused0")
        cin = k.shape[2]
        k = k.reshape(cin, -1)
        k1, b1 = k[:, :ch1], b[:ch1]
        k2r, b2r = k[:, ch1:ch1 + red3], b[ch1:ch1 + red3]
        k3r, b3r = k[:, ch1 + red3:], b[ch1 + red3:]
    else:
        (k1f, b1), (k2f, b2r), (k3f, b3r) = (
            _kb(blk, "branch1"), _kb(blk, "branch2_0"), _kb(blk, "branch3_0"))
        cin = k1f.shape[2]
        k1, k2r, k3r = (a.reshape(cin, -1) for a in (k1f, k2f, k3f))
    k2, b2 = _kb(blk, "branch2_1")            # 3x3 red3 -> ch3
    k3, b3 = _kb(blk, "branch3_1")            # 3x3 red5 -> ch5 (torch quirk)
    kp, bp = _kb(blk, "branch4_1")            # 1x1 cin -> proj
    return [k1, b1.reshape(1, -1),
            k2r, b2r.reshape(1, -1), k2, b2.reshape(1, -1),
            k3r, b3r.reshape(1, -1), k3, b3.reshape(1, -1),
            kp.reshape(cin, -1), bp.reshape(1, -1)]


def trunk_segment_params(variables, segment: str):
    """Flat weight list for :func:`fused_trunk_segment` from folded
    (optionally fused) inference variables."""
    p = variables["params"]
    if segment == "s23":
        k2, b2 = _kb(p, "conv2")
        k3, b3 = _kb(p, "conv3")
        out = [k2.reshape(64, 64), b2.reshape(1, 64),
               k3, b3.reshape(1, 192)]
        for name in ("inception3a", "inception3b"):
            out += _inception_params(p, name)
        return out
    if segment == "s45":
        out = []
        for name in ("inception4a", "inception4b", "inception4c",
                     "inception4d", "inception4e", "inception5a",
                     "inception5b"):
            out += _inception_params(p, name)
        return out
    raise ValueError(f"unknown segment {segment!r}")


# ---- kernel-side building blocks (probe-proven idioms only) ----------

def _stride2_lead(x):
    """x[0::2] on the leading axis of a 3-D/4-D array (reshape split)."""
    h = x.shape[0]
    return x.reshape((h // 2, 2) + x.shape[1:])[:, 0]


def _stride2_sub(x):
    """x[:, 0::2] on the second axis of a 3-D (h, w, c) array."""
    h, w, c = x.shape
    return x.reshape(h, w // 2, 2, c)[:, :, 0]


def _ceil_pool3x3s2(x):
    """MaxPool2d(3, stride 2, ceil_mode=True) on (h, w, c), h, w even —
    exact torch ceil_mode semantics (models.googlenet._ceil_maxpool)."""
    h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 2), (0, 2), (0, 0)), constant_values=-jnp.inf)
    rm = jnp.maximum(jnp.maximum(xp[0:h], xp[1:h + 1]), xp[2:h + 2])
    rm = _stride2_lead(rm)                              # (h//2, w+2, c)
    cm = jnp.maximum(jnp.maximum(rm[:, 0:w], rm[:, 1:w + 1]),
                     rm[:, 2:w + 2])
    return _stride2_sub(cm)                             # (h//2, w//2, c)


def _pool2x2s2(x):
    """MaxPool2d(2, stride 2) on (h, w, c), h, w even (pool4)."""
    rm = jnp.maximum(*(x.reshape((x.shape[0] // 2, 2) + x.shape[1:])
                       [:, i] for i in (0, 1)))
    h2, w, c = rm.shape
    p = rm.reshape(h2, w // 2, 2, c)
    return jnp.maximum(p[:, :, 0], p[:, :, 1])


def _pool3x3s1(x):
    """MaxPool2d(3, stride 1, pad 1) — the inception pool branch
    (-inf padding exactly like models.googlenet.Inception)."""
    h, w, _ = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    rm = jnp.maximum(jnp.maximum(xp[0:h], xp[1:h + 1]), xp[2:h + 2])
    return jnp.maximum(jnp.maximum(rm[:, 0:w], rm[:, 1:w + 1]),
                       rm[:, 2:w + 2])


def _conv1x1(x, k_ref, b_ref, relu=True):
    """1x1 conv + bias (+ ReLU) on (h, w, cin) -> (h, w, cout)."""
    h, w, cin = x.shape
    acc = jax.lax.dot_general(x.reshape(h * w, cin), k_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(x.dtype).reshape(h, w, -1)


def _conv3x3(x, k_ref, b_ref):
    """3x3 pad-1 conv + bias + ReLU as 9 shifted matmuls with one f32
    accumulator (zero padding == the reference's per-crop conv pad)."""
    h, w, cin = x.shape
    cout = k_ref.shape[3]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                xp[dy:dy + h, dx:dx + w].reshape(h * w, cin),
                k_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    return acc.astype(x.dtype).reshape(h, w, cout)


def _inception(x, ws):
    """One inception block from 12 weight refs (order of
    :func:`_inception_params`); concat on the lane axis of the 2-D
    views (reference: googlenet1.py:184-228)."""
    (k1, b1, k2r, b2r, k2, b2, k3r, b3r, k3, b3, kp, bp) = ws
    h, w, _ = x.shape
    o1 = _conv1x1(x, k1, b1)
    o2 = _conv3x3(_conv1x1(x, k2r, b2r), k2, b2)
    o3 = _conv3x3(_conv1x1(x, k3r, b3r), k3, b3)
    o4 = _conv1x1(_pool3x3s1(x), kp, bp)
    cat = jnp.concatenate(
        [o.reshape(h * w, o.shape[2]) for o in (o1, o2, o3, o4)], axis=1)
    return cat.reshape(h, w, cat.shape[1])


def _kernel_s23(x_ref, *refs):
    out_ref = refs[-1]
    ws = refs[:-1]
    x = x_ref[0]                                   # (128, 128, 64) conv1 out
    x = _ceil_pool3x3s2(x)                         # pool1 -> (64, 64, 64)
    x = _conv1x1(x, ws[0], ws[1])                  # conv2
    x = _conv3x3(x, ws[2], ws[3])                  # conv3 -> (64, 64, 192)
    x = _ceil_pool3x3s2(x)                         # pool2 -> (32, 32, 192)
    x = _inception(x, ws[4:16])                    # 3a -> (32, 32, 256)
    x = _inception(x, ws[16:28])                   # 3b -> (32, 32, 480)
    out_ref[0] = _ceil_pool3x3s2(x)                # pool3 -> (16, 16, 480)


def _kernel_s45(x_ref, *refs):
    out_ref = refs[-1]
    ws = refs[:-1]
    x = x_ref[0]                                   # (16, 16, 480) post-pool3
    for i in range(5):                             # inception4a..4e
        x = _inception(x, ws[12 * i:12 * (i + 1)])
    x = _pool2x2s2(x)                              # pool4 -> (8, 8, 832)
    x = _inception(x, ws[60:72])                   # 5a
    x = _inception(x, ws[72:84])                   # 5b -> (8, 8, 1024)
    h, w, c = x.shape                              # global average pool
    # out block is (1, 1, c): a (1, c) row per program — Mosaic requires
    # the last two block dims divisible by (8, 128) OR equal to the
    # overall array dims, which a (b, c) output with (1, c) blocks fails
    out_ref[0] = jnp.mean(x.reshape(h * w, c).astype(jnp.float32),
                          axis=0, keepdims=True).astype(x.dtype)


_OUT_SHAPE = {"s23": lambda h: (h // 8, h // 8, 480),
              "s45": lambda h: (1, 1024)}
_KERNELS = {"s23": _kernel_s23, "s45": _kernel_s45}


@functools.partial(jax.jit,
                   static_argnames=("segment", "interpret"))
def fused_trunk_segment(x, params, segment: str = "s23",
                        interpret: bool | None = None):
    """Run one fused trunk segment over a window batch.

    ``s23``: (B, D/2, D/2, 64) conv1 outputs -> (B, D/16, D/16, 480)
    pool3 outputs (resume the model with ``start_stage=4,
    start_pooled=True``). ``s45``: (B, D/16, D/16, 480) -> (B, 1024)
    global-average-pooled trunk features (apply the fc head outside).
    ``params`` from :func:`trunk_segment_params`.

    ``interpret=None``: interpreter on the CPU backend (the test
    suite), Mosaic-compiled otherwise (incl. the "axon" remote-TPU
    platform — NOT named "tpu", so test by exclusion)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h = x.shape[0], x.shape[1]
    if segment == "s23" and (x.shape[1] != x.shape[2] or h % 16):
        raise ValueError(f"square conv1 maps with H % 16 == 0 required, "
                         f"got {x.shape}")
    params = [p.astype(x.dtype) for p in params]
    out_shape = _OUT_SHAPE[segment](h)

    def full(shape):
        return pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _KERNELS[segment],
        grid=(b,),
        in_specs=[pl.BlockSpec((1,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (x.ndim - 1),
                               memory_space=pltpu.VMEM)]
                 + [full(p.shape) for p in params],
        out_specs=pl.BlockSpec((1,) + out_shape,
                               lambda i: (i,) + (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b,) + out_shape, x.dtype),
        interpret=interpret,
    )(x, *params)
    if segment == "s45":
        out = out.reshape(b, 1024)      # drop the block-alignment axis
    return out
