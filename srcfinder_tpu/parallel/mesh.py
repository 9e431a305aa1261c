"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's device parallelism
(torch.nn.DataParallel at cnn/cnn_pred_pipeline.py:113-116 and
multiprocessing pools): a 1-D or 2-D ``jax.sharding.Mesh`` with data-like
axes. The CMF columns axis (reference: the serial loop at
robust_mf.py:297) is embarrassingly parallel — sharding it over the mesh
needs no collectives at all; XLA partitions every batched op.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "column_sharding", "batch_sharding",
           "replicated_sharding", "shard_columns_mf"]


def make_mesh(n_devices: int | None = None, axis_names=("data",),
              shape=None) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    ``shape``: optional tuple matching ``axis_names`` for 2-D meshes
    (e.g. (4, 2) with ("data", "model")).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def column_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for (L, C, ...) arrays split on the columns axis."""
    return NamedSharding(mesh, P(None, axis))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for (N, ...) arrays split on the leading batch axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_fcn_shifts(mesh: Mesh, model, variables, img, scale: int = 32,
                     batch: int = 16, axis: str = "data"):
    """FCN shift-and-stitch with the shift batch sharded over the mesh —
    the multichip replacement for the reference's DataParallel inference
    (cnn/fcn_pred_pipeline.py:162-165). Each chunk of shifts splits
    across devices; the canvas and weights replicate; no collectives are
    needed until the final stitch gather.
    """
    import jax.numpy as jnp
    import numpy as np
    from ..detect.fcn_pipeline import (_fcn_shifts_chunk, divisibility_pad,
                                       stitch_stack)

    h0, w0 = img.shape
    padded = divisibility_pad(jnp.asarray(img), scale)
    canvas = jnp.pad(padded, ((scale, scale), (scale, scale)))
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh, axis)
    canvas = jax.device_put(canvas, rep)
    variables = jax.device_put(variables, rep)

    nshift = scale * scale
    idx = np.arange(nshift)
    tops, lefts = idx // scale, idx % scale
    outs = []
    for i in range(0, nshift, batch):
        t = jax.device_put(jnp.asarray(tops[i:i + batch]), bsh)
        l = jax.device_put(jnp.asarray(lefts[i:i + batch]), bsh)
        outs.append(_fcn_shifts_chunk(model, variables, canvas, t, l,
                                      scale, batch))
    preds = jnp.concatenate(outs, axis=0)
    return stitch_stack((h0, w0), preds, scale)


def shard_columns_mf(mesh: Mesh, x, m, abscf, alphas, **kwargs):
    """Run :func:`srcfinder_tpu.cmf.matched_filter_columns` with the
    detector-column axis sharded over the mesh.

    x: (L, C, B) with C divisible by the mesh size (pad if needed).
    All per-column outputs come back sharded on the same axis; no
    cross-device collectives are required by the algorithm.
    """
    from ..cmf.matched_filter import matched_filter_columns

    cols = column_sharding(mesh)
    rep = replicated_sharding(mesh)
    x = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
    m = jax.device_put(m, cols)
    abscf = jax.device_put(abscf, rep)
    alphas = jax.device_put(alphas, rep)
    return matched_filter_columns(x, m, abscf, alphas, **kwargs)
