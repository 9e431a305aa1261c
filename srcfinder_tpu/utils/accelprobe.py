"""Accelerator-link health probe: measured host->device bandwidth.

On this deployment the TPU v5e is reached through the "axon" tunnel,
whose host->device bandwidth is *weather*: measured 75 MB/s (r4,
SCALING.md "CLI startup"), 12-37 MB/s (r5), and implied ~1 MB/s during
the r5 e2e soak where a 0.48 GB slab upload stretched the CMF phase to
611-722 s while the page-supply probe read healthy (SCALING.md "The e2e
warm>cold mystery"). A locally attached TPU moves the same bytes at
GB/s. Nothing in JAX reports this number, so transfer-heavy stages
cannot be routed (device vs host) or adjudicated (code regression vs
link weather) without measuring it.

``h2d_probe`` times two device_put transfers of different sizes and
fits ``t = overhead + bytes/bw``: the slope separates steady-state
bandwidth from the ~1-2 s fixed per-transfer cost observed on the
tunnel. Completion is forced by fetching one element — through the
tunnel ``block_until_ready`` returns early (CLAUDE.md), so it cannot
time anything.

The reference has no analog (its GPUs are PCIe-local and its pipelines
assume cheap transfers, e.g. cnn_pred_pipeline.py:53-58 ships every
256x256 window to the device); this module is deployment-VM
engineering in the same class as core/directio.py.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

__all__ = ["h2d_probe"]

_CACHE: dict = {}

# cross-process probe cache: link weather changes on minute scales, the
# pipeline spawns fresh processes on second scales (one per flightline,
# three per bench soak) — re-measuring a dead link in every process
# costs exactly the seconds the probe exists to save
_STATE_TTL_S = float(os.environ.get("SRCFINDER_H2D_TTL_S", "600"))


def _state_path():
    return os.environ.get(
        "SRCFINDER_H2D_STATE",
        os.path.join(tempfile.gettempdir(), "srcfinder_h2d.json"))


def _time_put(nbytes, device):
    import jax

    x = np.ones(nbytes, np.uint8)
    t0 = time.time()
    y = jax.device_put(x, device)
    np.asarray(y[-1:])          # forces the transfer to complete
    dt = time.time() - t0
    del y
    return dt


def h2d_probe(device=None, refresh: bool = False):
    """Measure host->device transfer characteristics.

    Returns ``{"mb_s": float, "overhead_s": float, "device": str}`` or
    ``None`` when the default backend is the (local) CPU — there is no
    link to probe. Adaptive ladder so the probe never floods the link
    it is diagnosing (a fixed 4 MB first transfer was observed to take
    ~6 min on a stalled tunnel, competing with the very stage it was
    meant to route, r5): a 256 KB first point sizes the second point
    (16 MB healthy / 4 MB slow / 64 KB dead), and past 5 s the single
    point is returned as-is — at that magnitude the routing decision
    does not need the overhead-vs-slope split. Cached per process per
    device AND per host in a TTL'd state file (``SRCFINDER_H2D_STATE``,
    default ``$TMPDIR/srcfinder_h2d.json``, TTL
    ``SRCFINDER_H2D_TTL_S``=600): fresh pipeline processes inherit the
    measurement instead of re-paying it. ``refresh`` re-measures and
    rewrites both caches.
    """
    import jax

    if device is None:
        device = jax.devices()[0]
    if device.platform == "cpu":
        return None
    key = repr(device)
    if not refresh:
        if key in _CACHE:
            return _CACHE[key]
        try:
            st = json.load(open(_state_path()))
            if (st.get("device") == key
                    and time.time() - st.get("ts", 0) < _STATE_TTL_S):
                res = {k: st[k] for k in ("mb_s", "overhead_s", "device")}
                _CACHE[key] = res
                return res
        except (OSError, ValueError, KeyError):
            pass

    s0 = 256 << 10
    t0 = _time_put(s0, device)
    if t0 > 5.0:
        # stalled link (< ~51 KB/s): one point is decision-grade, and a
        # second transfer would only steal more of what little remains
        sizes, times = [s0], [t0]
    elif t0 > 1.5:
        sizes, times = [64 << 10, s0], [_time_put(64 << 10, device), t0]
    elif t0 > 0.15:
        sizes, times = [s0, 4 << 20], [t0, _time_put(4 << 20, device)]
    else:
        sizes, times = [s0, 16 << 20], [t0, _time_put(16 << 20, device)]
    if len(sizes) >= 2 and times[-1] > times[0]:
        # two-point fit: slope = bandwidth, intercept = fixed cost
        bw = (sizes[-1] - sizes[0]) / (times[-1] - times[0])
        overhead = max(0.0, times[0] - sizes[0] / bw)
    else:
        # noise inverted the ordering (seen on the tunnel: 32 MB in
        # 2.6 s then 64 MB in 1.75 s) — fall back to the aggregate
        bw = sum(sizes) / max(sum(times), 1e-9)
        overhead = 0.0
    res = {"mb_s": round(bw / 1e6, 2), "overhead_s": round(overhead, 2),
           "device": key}
    _CACHE[key] = res
    try:                                  # atomic publish, best-effort
        path = _state_path()
        with open(path + ".part", "w") as f:
            json.dump(dict(res, ts=time.time()), f)
        os.replace(path + ".part", path)
    except OSError:
        pass
    return res
