"""Analytic FLOP accounting for MFU reporting.

The reference publishes only wall-clock numbers (cnn/README.md:263-301);
for TPU efficiency work we also need achieved FLOP/s vs the chip's peak
(MFU). FLOPs are counted by walking the jaxpr of the actual functions we
run and summing 2*prod(out)*K for every conv_general_dilated and
dot_general — no compilation required, so the count is exact for the
traced shapes and free to compute.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["count_matmul_flops", "fcn_phase_flops", "tpu_peak_flops",
           "count_hbm_bytes", "fcn_phase_bytes", "tpu_peak_hbm_bw",
           "roofline_seconds"]


def _jaxpr_flops(jaxpr) -> int:
    """Sum matmul/conv FLOPs over a (possibly nested) jaxpr."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)  # ClosedJaxpr -> Jaxpr
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            out = eqn.outvars[0].aval
            rhs = eqn.invars[1].aval
            dn = eqn.params["dimension_numbers"]
            cin = rhs.shape[dn.rhs_spec[1]]
            ksp = int(np.prod([rhs.shape[i] for i in dn.rhs_spec[2:]]))
            fg = eqn.params.get("feature_group_count", 1)
            total += 2 * int(np.prod(out.shape)) * (cin // max(fg, 1)) * ksp
        elif name == "dot_general":
            (lc, _), _ = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval
            out = eqn.outvars[0].aval
            k = int(np.prod([lhs.shape[i] for i in lc]))
            total += 2 * int(np.prod(out.shape)) * k
        else:
            mult = int(eqn.params.get("length", 1)) if name == "scan" else 1
            for v in eqn.params.values():
                if hasattr(v, "eqns") or hasattr(v, "jaxpr"):
                    total += mult * _jaxpr_flops(v)
    return total


def count_matmul_flops(fn, *args, **kwargs) -> int:
    """Matmul/conv FLOPs of ``fn(*args, **kwargs)`` (trace only)."""
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return _jaxpr_flops(jaxpr)


def fcn_phase_flops(model, variables, shape, scale: int = 32) -> int:
    """Total matmul/conv FLOPs of the phase-deduplicated FCN saliency
    pass (detect.fcn_pipeline.fcn_phase_saliency) for a raw band of
    ``shape`` (H, W): each trunk stage s runs once per distinct phase
    (4^s maps), plus the 1x1 fc applied to all 1024 phase maps."""
    h, w = shape
    pad0 = scale - (h % scale)
    pad1 = scale - (w % scale)
    hp = h + pad0 + scale          # canvas minus one scale margin
    wp = w + pad1 + scale
    x = jax.ShapeDtypeStruct((1, hp, wp, 1), jnp.float32)

    total = 0
    for s in (1, 2, 3, 4, 5):
        def stage_fn(a, _s=s):
            return model.apply(variables, a, train=False, stage=_s)
        total += (4 ** s) * count_matmul_flops(stage_fn, x)
        x = jax.eval_shape(stage_fn, x)

    n5, h5, w5, c5 = (scale * scale,) + tuple(x.shape[1:])
    ncls = variables["params"]["fc"]["kernel"].shape[-1]
    total += 2 * n5 * h5 * w5 * c5 * ncls
    return total


def _jaxpr_bytes(jaxpr) -> int:
    """Estimated HBM traffic of the conv/dot ops in a jaxpr: each
    counts its operand + result tensors once (weights included).
    Elementwise/layout ops are assumed fused into their producers (XLA
    does this), so this is a LOWER bound on real traffic — the right
    side for a roofline argument ("even a perfect schedule must move at
    least this much")."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("conv_general_dilated", "dot_general"):
            for v in list(eqn.invars) + list(eqn.outvars):
                aval = v.aval
                if hasattr(aval, "shape"):
                    total += int(np.prod(aval.shape)) * aval.dtype.itemsize
        else:
            mult = int(eqn.params.get("length", 1)) if name == "scan" else 1
            for v in eqn.params.values():
                if hasattr(v, "eqns") or hasattr(v, "jaxpr"):
                    total += mult * _jaxpr_bytes(v)
    return total


def count_hbm_bytes(fn, *args, **kwargs) -> int:
    """Lower-bound HBM bytes moved by the conv/dot ops of
    ``fn(*args, **kwargs)`` (trace only; see :func:`_jaxpr_bytes`)."""
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return _jaxpr_bytes(jaxpr)


def fcn_phase_bytes(model, variables, shape, scale: int = 32,
                    dtype=jnp.float32) -> int:
    """Lower-bound HBM traffic of the phase-deduplicated FCN pass
    (mirrors :func:`fcn_phase_flops`' stage accounting)."""
    h, w = shape
    pad0 = scale - (h % scale)
    pad1 = scale - (w % scale)
    hp = h + pad0 + scale
    wp = w + pad1 + scale
    x = jax.ShapeDtypeStruct((1, hp, wp, 1), dtype)

    total = 0
    for s in (1, 2, 3, 4, 5):
        def stage_fn(a, _s=s):
            return model.apply(variables, a, train=False, stage=_s)
        total += (4 ** s) * count_hbm_bytes(stage_fn, x)
        x = jax.eval_shape(stage_fn, x)

    n5, h5, w5, c5 = (scale * scale,) + tuple(x.shape[1:])
    ncls = variables["params"]["fc"]["kernel"].shape[-1]
    itemsize = jnp.dtype(dtype).itemsize
    total += (n5 * h5 * w5 * (c5 + ncls) + c5 * ncls) * itemsize
    return total


def tpu_peak_hbm_bw(device=None) -> float | None:
    """Peak HBM bandwidth (bytes/s) per chip, or None if unknown.
    Published per-chip numbers."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if device.platform != "tpu" and "tpu" not in kind:
        return None
    table = {
        "v5 lite": 819e9, "v5e": 819e9,
        "v5p": 2765e9, "v5": 2765e9,
        "v4": 1228e9,
        "v6 lite": 1640e9, "v6e": 1640e9,
        "v3": 900e9, "v2": 700e9,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return None


def roofline_seconds(flops: int, bytes_moved: int, device=None):
    """Roofline lower-bound runtime on the device: max(compute time at
    MXU peak, transfer time at HBM peak). Returns (seconds, bound) with
    bound in {"compute", "bandwidth"} — or (None, None) off-TPU."""
    peak_f = tpu_peak_flops(device)
    peak_b = tpu_peak_hbm_bw(device)
    if not peak_f or not peak_b:
        return None, None
    tc = flops / peak_f
    tb = bytes_moved / peak_b
    return max(tc, tb), ("compute" if tc >= tb else "bandwidth")


def tpu_peak_flops(device=None) -> float | None:
    """Peak dense matmul FLOP/s for the device (bf16 path), or None if
    unknown. Values are the published per-chip peaks."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if device.platform != "tpu" and "tpu" not in kind:
        return None
    table = {
        "v5 lite": 197e12, "v5e": 197e12,
        "v5p": 459e12, "v5": 459e12,
        "v4": 275e12,
        "v6 lite": 918e12, "v6e": 918e12,
        "v3": 123e12, "v2": 45e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return None
