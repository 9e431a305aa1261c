"""Gaussian-PSF downsampling of a flightline to coarser GSD.

Reference (cnn/posthoc_down.py): blur with a gaussian kernel whose FWHM
equals the target resolution via astropy ``convolve_fft``
(nan_treatment='fill', fill 0, preserve_nan) then nearest-resample with
``gdal_translate -tr``. Here the FFT convolution is jitted jnp.fft work
on device and the resample is a strided gather; no GDAL subprocesses.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["gkern", "get_pixsig", "gaussian_downsample"]


def gkern(l: int = 5, sig: float = 1.0):
    """Normalized 2-D gaussian kernel (reference: posthoc_down.py:13-19)."""
    ax = jnp.linspace(-(l - 1) / 2.0, (l - 1) / 2.0, l)
    gauss = jnp.exp(-0.5 * jnp.square(ax) / jnp.square(sig))
    kernel = jnp.outer(gauss, gauss)
    return kernel / jnp.sum(kernel)


def get_pixsig(ores: float, tres: float) -> float:
    """PSF sigma in pixels from source/target resolution: the target GSD
    is the blur FWHM (reference: posthoc_down.py:21-25)."""
    sig = tres / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    return sig / ores


@functools.partial(jax.jit, static_argnames=("kerw",))
def _nan_preserving_fft_blur(data, sig, kerw: int):
    """FFT convolution with NaN->0 fill and NaN restoration
    (astropy convolve_fft nan_treatment='fill', preserve_nan=True,
    boundary='fill' 0 — reference: posthoc_down.py:84-92)."""
    nanmask = jnp.isnan(data)
    filled = jnp.where(nanmask, 0.0, data)
    h, w = data.shape
    pad_h, pad_w = kerw // 2, kerw // 2
    big = jnp.pad(filled, ((pad_h, pad_h), (pad_w, pad_w)))
    ker = gkern(kerw, sig)
    kbig = jnp.zeros_like(big).at[:kerw, :kerw].set(ker)
    # center the kernel so the convolution is phase-correct
    kbig = jnp.roll(kbig, (-(kerw // 2), -(kerw // 2)), axis=(0, 1))
    out = jnp.fft.irfft2(jnp.fft.rfft2(big) * jnp.fft.rfft2(kbig),
                         s=big.shape)
    out = out[pad_h: pad_h + h, pad_w: pad_w + w]
    return jnp.where(nanmask, jnp.nan, out)


def gaussian_downsample(data, src_res: float, dst_res: float = 30.0,
                        nodata: float = -9999.0):
    """Blur to the target PSF then nearest-resample (reference:
    posthoc_down.py:64-110). Returns the resampled array."""
    data = jnp.asarray(data, jnp.float32)
    data = jnp.where(data == nodata, jnp.nan, data)
    sig = get_pixsig(src_res, dst_res)
    kerw = int(np.ceil((dst_res * np.sqrt(2) * 2) / src_res))
    if kerw % 2 == 0:
        kerw += 1
    blurred = _nan_preserving_fft_blur(data, sig, kerw)
    blurred = jnp.where(jnp.isnan(blurred), nodata, blurred)
    # nearest resample at scale dst_res/src_res: gdal picks the pixel
    # containing each target-cell center
    scale = dst_res / src_res
    h, w = data.shape
    oh, ow = int(h / scale), int(w / scale)
    rr = jnp.clip(jnp.floor((jnp.arange(oh) + 0.5) * scale), 0, h - 1).astype(int)
    cc = jnp.clip(jnp.floor((jnp.arange(ow) + 0.5) * scale), 0, w - 1).astype(int)
    return blurred[rr][:, cc]
