"""PyTorch GoogLeNet checkpoint -> Flax variables converter.

The reference ships trained ``.pt`` state dicts (reference: cnn/models/*,
roles documented in cnn/README.md:5-13; loaded at
cnn_pred_pipeline.py:110-111). This module maps those tensors onto the
Flax :class:`srcfinder_tpu.models.googlenet.GoogLeNet` layout:

- Conv2d OIHW -> HWIO
- Linear (out, in) -> (in, out)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
- aux fc1 flattens 128x4x4 activations: torch flattens CHW, we flatten
  HWC, so the 2048-dim input axis is permuted accordingly.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["torch_state_dict_to_flax", "load_pt", "flax_to_torch_state_dict"]


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _dense(w):
    return np.transpose(np.asarray(w), (1, 0))


def _aux_fc1(w):
    """(1024, 2048=C*H*W) torch -> (2048=H*W*C, 1024) flax."""
    w = np.asarray(w).reshape(1024, 128, 4, 4)
    w = np.transpose(w, (2, 3, 1, 0))  # -> (4, 4, 128, 1024)
    return w.reshape(2048, 1024)


_BRANCH_RENAME = {
    "branch1": "branch1",
    "branch2.0": "branch2_0",
    "branch2.1": "branch2_1",
    "branch3.0": "branch3_0",
    "branch3.1": "branch3_1",
    "branch4.1": "branch4_1",
}


def _assign(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(sd):
    """Convert a torch GoogLeNet state_dict (tensors or numpy arrays) into
    ``{"params": ..., "batch_stats": ...}`` for the Flax model."""
    params: dict = {}
    stats: dict = {}

    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        v = np_(val)

        # top-level fc
        if parts[0] == "fc":
            _assign(params, ["fc", "kernel" if parts[1] == "weight" else "bias"],
                    _dense(v) if parts[1] == "weight" else v)
            continue

        # aux heads
        if parts[0] in ("aux1", "aux2"):
            aux = parts[0]
            if parts[1] == "conv":
                mod, leaf = parts[2], parts[3]
                _route_convbn(params, stats, [aux, "conv"], mod, leaf, v)
            elif parts[1] in ("fc1", "fc2"):
                which = "kernel" if parts[2] == "weight" else "bias"
                if parts[1] == "fc1" and which == "kernel":
                    v = _aux_fc1(v)
                elif which == "kernel":
                    v = _dense(v)
                _assign(params, [aux, parts[1], which], v)
            continue

        # inception blocks: inception3a.branch2.0.conv.weight
        m = re.match(r"(inception\d[a-e])\.(branch\d(?:\.\d)?)\.(conv|bn)\.(.+)",
                     key)
        if m:
            blk, branch, mod, leaf = m.groups()
            branch = _BRANCH_RENAME[branch]
            _route_convbn(params, stats, [blk, branch], mod, leaf, v)
            continue

        # stem convs: conv1.conv.weight / conv1.bn.*
        m = re.match(r"(conv\d)\.(conv|bn)\.(.+)", key)
        if m:
            blk, mod, leaf = m.groups()
            _route_convbn(params, stats, [blk], mod, leaf, v)
            continue

        raise KeyError(f"unrecognized torch key: {key}")

    return {"params": params, "batch_stats": stats}


def _route_convbn(params, stats, prefix, mod, leaf, v):
    if mod == "conv":
        assert leaf == "weight"
        _assign(params, prefix + ["conv", "kernel"], _conv(v))
    else:  # bn
        if leaf == "weight":
            _assign(params, prefix + ["bn", "scale"], v)
        elif leaf == "bias":
            _assign(params, prefix + ["bn", "bias"], v)
        elif leaf == "running_mean":
            _assign(stats, prefix + ["bn", "mean"], v)
        elif leaf == "running_var":
            _assign(stats, prefix + ["bn", "var"], v)
        else:
            raise KeyError(f"unknown bn leaf {leaf}")


def load_pt(path: str):
    """Load a reference ``.pt`` checkpoint into Flax variables
    (reference: cnn_pred_pipeline.py:111 ``torch.load(weightpath)``)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_flax(sd)


def flax_to_torch_state_dict(variables):
    """Inverse conversion (for exporting trained weights to the reference
    toolchain)."""
    out = {}

    def walk(tree, prefix, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + [k], is_stats)
            else:
                out[tuple(prefix + [k])] = np.asarray(v)

    walk(variables["params"], [], False)
    walk(variables.get("batch_stats", {}), [], True)

    sd = {}
    for path, v in out.items():
        keys = list(path)
        flax_leaf = keys[-1]
        mods = keys[:-1]
        name = ".".join(mods)
        name = re.sub(r"branch(\d)_(\d)", r"branch\1.\2", name)
        if flax_leaf == "kernel":
            if v.ndim == 4:
                sd[name.replace("conv", "conv", 1) + ".weight"] = \
                    np.transpose(v, (3, 2, 0, 1))
            else:
                if mods[-1] == "fc1" and mods[0] in ("aux1", "aux2"):
                    w = v.reshape(4, 4, 128, 1024)
                    w = np.transpose(w, (3, 2, 0, 1)).reshape(1024, 2048)
                    sd[name + ".weight"] = w
                else:
                    sd[name + ".weight"] = np.transpose(v, (1, 0))
        elif flax_leaf == "scale":
            sd[name + ".weight"] = v
        elif flax_leaf == "bias":
            sd[name + ".bias"] = v
        elif flax_leaf == "mean":
            sd[name + ".running_mean"] = v
        elif flax_leaf == "var":
            sd[name + ".running_var"] = v
    return sd
