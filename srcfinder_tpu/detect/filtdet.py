"""KDE-weighted detection filtering.

Reference (srcfinder_util.py:1422-1482 ``filtdet`` with module constants
kernel=50, mfmin/mfmax=500/1500, minarea=9, mfminsmall=1250 at :106-109):
gaussian-KDE-weight the CH4 map, clip to [mfmin, mfmax], drop small
components, re-add small components whose raw MF exceeds mfminsmall, and
relabel.

The KDE smoothing (gaussian_filter sigma=k truncate=1) runs as a jitted
separable convolution on device; component labeling stays host-side
(scipy union-find — sequential by nature and cheap).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.morphology import (imlabel, remove_small_objects,
                               relabel_sequential)

__all__ = ["kde", "filtdet", "KERNEL", "MFMIN", "MFMAX", "MINAREA",
           "MFMINSMALL", "NODATA"]

# (reference: srcfinder_util.py:104-109)
KERNEL = 50
MFMIN, MFMAX = 500, 1500
MINAREA = 9
MFMINSMALL = 1250
NODATA = -9999


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def _gaussian2d(img, sigma: int, truncate: float = 1.0):
    """Separable gaussian blur matching scipy.ndimage.gaussian_filter
    semantics (radius = truncate*sigma, 'reflect' boundary)."""
    radius = int(truncate * sigma + 0.5)
    xx = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (xx / sigma) ** 2)
    k = k / k.sum()
    pad = [(radius, radius)]

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        # scipy.ndimage 'reflect' includes the edge sample = numpy 'symmetric'
        ap = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + pad, mode="symmetric")
        out = jax.lax.conv_general_dilated(
            ap[:, None, :], k[None, None, :], (1,), "VALID")[:, 0, :]
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, 0), 1)


def kde(img, k: int = KERNEL):
    """Min-max-normalized gaussian density times the image
    (reference: srcfinder_util.py:1383-1387)."""
    img = jnp.asarray(img)
    sm = _gaussian2d(img, k)
    sm = (sm - sm.min()) / (sm.max() - sm.min())
    return img * sm


def filtdet(ch4mf, nodata_mask, minarea: int = MINAREA, mfmin: float = MFMIN,
            mfmax: float = MFMAX, k: int = KERNEL,
            mfminsmall: float = MFMINSMALL, skip_kde: bool = False,
            use_abs: bool = False):
    """Filter weakly-connected detections (reference:
    srcfinder_util.py:1422-1482).

    Returns (detkde, detcomp): the clipped KDE-weighted detection image in
    [0,1] and the labeled component image.
    """
    ch4mf = np.asarray(ch4mf, dtype=np.float32)
    nodata_mask = np.asarray(nodata_mask, bool)
    detkde = np.abs(ch4mf) if use_abs else ch4mf.copy()
    ch4min = ch4mf >= mfmin
    if not skip_kde:
        detkde = np.asarray(kde(detkde, k=k))
    detkde = np.clip((detkde - mfmin) / (mfmax - mfmin), 0.0, 1.0)

    detmask = detkde > 0
    detsmall = detmask.copy()
    detmask = remove_small_objects(detmask, min_size=minarea)
    if mfminsmall >= mfmin:
        # re-add small components whose raw MF is strong
        smallcc = imlabel(detsmall != detmask)
        smallkeep = np.unique(smallcc[ch4mf >= mfminsmall])
        smallkeep = smallkeep[smallkeep != 0]
        smallmask = np.isin(smallcc, smallkeep)
        detmask = detmask | smallmask

    # exclude sub-threshold + nodata afterward so interior holes do not
    # split components
    detcomp = imlabel(detmask)
    detcomp[~ch4min] = 0
    detcomp, _, _ = relabel_sequential(detcomp)

    detkde[~ch4min] = 0
    detkde[nodata_mask] = 0
    detcomp[nodata_mask] = 0
    return detkde, detcomp
