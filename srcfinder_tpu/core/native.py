"""Python surface over the native runtime extension, with numpy fallbacks.

``srcfinder_tpu._native`` (native/enviio.cpp) provides the host-side hot
paths: BIL window repacking into the device layout and 8-connected
labeling. When the extension is not built, equivalent numpy/scipy code
runs instead — identical results, just slower.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HAVE_NATIVE", "bil_window_to_lcb", "label8"]

try:
    from srcfinder_tpu import _native
    HAVE_NATIVE = True
except ImportError:  # extension not built
    _native = None
    HAVE_NATIVE = False


def bil_window_to_lcb(mm, b0: int, b1: int, c0: int, c1: int,
                      out=None) -> np.ndarray:
    """(L, B, C) BIL source (memmap ok) -> float32 (L, c1-c0, b1-b0)."""
    L = mm.shape[0]
    if out is None:
        out = np.empty((L, c1 - c0, b1 - b0), np.float32)
    if HAVE_NATIVE and mm.dtype in (np.float32, np.float64, np.int16,
                                    np.uint16, np.int32):
        _native.bil_window_to_lcb(memoryview(mm), memoryview(out),
                                  b0, b1, c0, c1)
        return out
    out[...] = np.asarray(mm[:, b0:b1, c0:c1]).transpose(0, 2, 1)
    return out


def label8(mask) -> np.ndarray:
    """8-connected component labels (int32), sequential ids from 1."""
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    if HAVE_NATIVE:
        out = np.zeros(mask.shape, np.int32)
        _native.label8(memoryview(mask), memoryview(out))
        return out
    from .morphology import imlabel
    return imlabel(mask).astype(np.int32)
