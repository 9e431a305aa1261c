"""FCN shift-and-stitch saliency — the headline benchmark workload.

Reference (cnn/fcn_pred_pipeline.py): the CNN-turned-FCN has output
stride 32, so full-resolution saliency is recovered by running the whole
flightline once per (top, left) shift of a 32x32 grid and interlacing the
1024 downsampled outputs (``stitch_stack``, fcn_pred_pipeline.py:73-95).
The reference feeds shifts through a DataLoader one padded copy at a time
and stitches on the host with a python loop.

TPU re-design:
- the padded flightline is materialized ONCE on device; every shifted
  view is a ``dynamic_slice`` of the same canvas inside jit (zero HBM
  duplication, no host->device traffic per shift);
- shifts are a batch dimension — one jitted GoogLeNet-trunk forward per
  chunk of shifts rides the MXU at full batch efficiency;
- stitching is a transpose+flip+reshape on device: the (top, left) shift
  grid IS the subpixel phase grid, so
  ``stitched[s-1-top::s, s-1-left::s] = pred[top, left]`` is exactly
  ``preds.reshape(s, s, h, w) -> flip both shift axes -> transpose to
  (h, s, w, s) -> reshape (h*s, w*s)``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models.googlenet import GoogLeNet
from ..models.fcn import fcn_apply

__all__ = ["fcn_shift_saliency", "stitch_stack", "fcn_saliency_image"]


def divisibility_pad(img, scale: int):
    """Pad bottom/right so dims are divisible by ``scale``. Reproduces the
    reference quirk of adding a FULL extra ``scale`` when already
    divisible (fcn_pred_pipeline.py:47-51 pads ``scale - dim % scale``)."""
    h, w = img.shape
    pad0 = scale - (h % scale)
    pad1 = scale - (w % scale)
    return jnp.pad(img, ((0, pad0), (0, pad1)))


@functools.partial(jax.jit, static_argnames=("model", "scale", "chunk"))
def _fcn_shifts_chunk(model: GoogLeNet, variables, canvas, tops, lefts,
                      scale: int, chunk: int):
    """canvas: (H'+2s, W'+2s) zero-padded; returns (chunk, h32, w32)
    class-1 probabilities for the given shifts."""
    hp = canvas.shape[0] - scale
    wp = canvas.shape[1] - scale

    def one(top, left):
        view = jax.lax.dynamic_slice(canvas, (scale - top, scale - left),
                                     (hp, wp))
        return view

    views = jax.vmap(one)(tops, lefts)[..., None]           # (chunk,H,W,1)
    logits = fcn_apply(model, variables, views)
    return jax.nn.softmax(logits, axis=-1)[..., 1]


def stitch_stack(fl_shape, preds, scale: int = 32):
    """Interlace the (scale*scale, h, w) shift outputs back to full
    resolution and center-crop (reference: fcn_pred_pipeline.py:73-95).

    ``preds`` must be ordered by shift index i = top*scale + left.
    """
    s = scale
    S, h, w = preds.shape
    assert S == s * s
    grid = preds.reshape(s, s, h, w)          # [top, left, y, x]
    grid = grid[::-1, ::-1]                   # phase = s-1-top, s-1-left
    stitched = jnp.transpose(grid, (2, 0, 3, 1)).reshape(h * s, w * s)
    return stitched[s // 2: fl_shape[0] + s // 2,
                    s // 2: fl_shape[1] + s // 2]


def fcn_shift_saliency(model: GoogLeNet, variables, img, scale: int = 32,
                       batch: int = 16):
    """Full shift-and-stitch saliency for one preprocessed flightline.

    img: (H, W) already clamp+normalized. Returns (H, W) saliency.
    """
    h0, w0 = img.shape
    padded = divisibility_pad(jnp.asarray(img), scale)
    canvas = jnp.pad(padded, ((scale, scale), (scale, scale)))

    nshift = scale * scale
    idx = np.arange(nshift)
    tops, lefts = idx // scale, idx % scale
    outs = []
    for i in range(0, nshift, batch):
        t = jnp.asarray(tops[i:i + batch])
        l = jnp.asarray(lefts[i:i + batch])
        if t.shape[0] < batch:  # pad to keep jit cache warm; drop later
            padn = batch - t.shape[0]
            t = jnp.concatenate([t, jnp.zeros(padn, t.dtype)])
            l = jnp.concatenate([l, jnp.zeros(padn, l.dtype)])
            out = _fcn_shifts_chunk(model, variables, canvas, t, l, scale,
                                    batch)[: batch - padn]
        else:
            out = _fcn_shifts_chunk(model, variables, canvas, t, l, scale,
                                    batch)
        outs.append(out)
    preds = jnp.concatenate(outs, axis=0)
    return stitch_stack((h0, w0), preds, scale)


def fcn_saliency_image(img, variables, model_name: str = "multi_64",
                       scale: int = 32, batch: int = 16, nodata=-9999.0,
                       model: GoogLeNet | None = None, dtype=jnp.float32):
    """End-to-end: raw CH4 band -> preprocessed -> saliency with nodata
    re-stamped (reference: fcn_pred_pipeline.py:219-242)."""
    from .preprocess import preprocess_ch4, norm_for_model

    model = model or GoogLeNet(num_classes=2, dtype=dtype)
    mean, std = norm_for_model(model_name)
    x = preprocess_ch4(jnp.asarray(img, dtype), mean, std)
    sal = fcn_shift_saliency(model, variables, x, scale=scale, batch=batch)
    sal = jnp.where(jnp.asarray(img) == nodata, nodata, sal)
    return sal
