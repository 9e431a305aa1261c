"""Spectrometer QC masks: cloud / specular / flare / dark.

Reference (spectrometer_masks/masks_sds.py, BSD-3 Utah heritage; AWS
variant msf_flow/deployment/spectrometer-masks/masks_sds.py): blockwise
streaming over lines with overlap, four per-pixel tests plus flare-region
growth and cloud buffering, 4-band int16 ENVI output with the radiance
nodata border stamped.

TPU re-design: all per-pixel spectral tests fuse into ONE jitted kernel
per line block (a single pass over the block's bands in VMEM); the
region-growth morphology (labeling + dilation) stays host-side.

Behavioral notes recorded here:
- the reference's cloud test calls ``np.logical_and(a, b, c)`` with THREE
  masks (masks_sds.py:231) — numpy treats the third argument as ``out``,
  so the second slope test is silently overwritten, not applied. This
  implementation applies the documented Thompson-2014 intent (bright AND
  both slopes negative); pass ``two_slope=False`` for the literal
  reference behavior.
- the reference grows/dilates inside a per-coordinate python loop
  (masks_sds.py:316-332) with the same net effect as one dilation of the
  veto-filtered large regions; that is what we compute.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from scipy import ndimage

from ..core.morphology import disk, imlabel

__all__ = ["MaskParams", "pixel_masks", "grow_flare_mask", "dilate_mask",
           "masks_for_cube", "get_radius_in_pixels"]

SAT_THRESH_DEFAULT = 6.0       # (reference: masks_sds.py:50)
SAT_THRESH_CLD = 15.0          # (reference: masks_sds.py:52)
DARK_THRESH_DEFAULT = 0.104    # (reference: masks_sds.py:54)
VIS_GROW_THRESH = 9.0          # (reference: masks_sds.py:102-103)


class MaskParams(NamedTuple):
    saturation_threshold: float = SAT_THRESH_DEFAULT
    saturation_window: tuple = (1945.0, 2485.0)
    cld_threshold: float = SAT_THRESH_CLD
    cld_bands: tuple = (15, 60, 175)   # 450/1250(+670) nm AVIRIS-NG bands
    dark_threshold: float = DARK_THRESH_DEFAULT
    dark_band: int = 352               # 2139 nm
    spec_band: int = 25
    vis_grow_threshold: float = VIS_GROW_THRESH
    two_slope: bool = True


@functools.partial(jax.jit, static_argnames=("params",))
def pixel_masks(block, wavelengths, params: MaskParams):
    """Fused per-pixel spectral tests for one (rows, cols, bands) block.

    Returns (saturated, cloud, spec, dark) boolean maps
    (reference: get_saturation_mask :133-150, get_cloud_mask :180-233,
    get_spec_mask :152-162, get_dark_mask :164-178).
    """
    lo, hi = params.saturation_window
    in_window = (wavelengths >= lo) & (wavelengths <= hi)
    saturated = jnp.any(
        (block > params.saturation_threshold) & in_window[None, None, :],
        axis=-1)

    b0, b1, b2 = params.cld_bands
    rdn1, rdn2, rdn3 = block[..., b0], block[..., b1], block[..., b2]
    is_bright = rdn1 > params.cld_threshold
    # negative spectral slopes (wavelengths increase with band index)
    slope_a = (rdn2 - rdn1) / (wavelengths[b1] - wavelengths[b0]) < 0
    slope_b = (rdn3 - rdn2) / (wavelengths[b2] - wavelengths[b1]) < 0
    cloud = is_bright & slope_a & (slope_b if params.two_slope else True)

    spec = saturated & (block[..., params.spec_band]
                        > params.vis_grow_threshold)

    darkv = block[..., params.dark_band]
    dark = (darkv < params.dark_threshold) & ~(darkv <= -9999)
    return saturated, cloud, spec, dark


def get_radius_in_pixels(value_str: str, metadata) -> float:
    """'150m' or '10px' -> pixels using ENVI map-info resolution
    (reference: masks_sds.py:235-250)."""
    if value_str.endswith("px"):
        return float(np.ceil(float(value_str[:-2])))
    if value_str.endswith("m"):
        if "map info" not in metadata:
            raise RuntimeError("Image does not have resolution specified. "
                               "Try giving values in pixels.")
        if "meters" not in str(metadata["map info"][10]).lower():
            raise RuntimeError("Unknown unit for image resolution.")
        mx = float(metadata["map info"][5])
        my = float(metadata["map info"][6])
        if mx != my:
            mx = (mx + my) / 2.0
        return float(np.ceil(float(value_str[:-1]) / mx))
    raise RuntimeError("Unknown unit specified.")


def grow_flare_mask(saturated, spec, vis_veto, grow_radius_px: float,
                    mingrowarea) -> np.ndarray:
    """Flare band: 2 where the grown buffer of large saturated regions
    lands, 1 at saturated non-specular pixels
    (reference: masks_sds.py:313-332).

    ``vis_veto``: bool map where 500 nm radiance >= threshold (sun glint,
    excluded from growing).
    """
    saturated = np.asarray(saturated, bool)
    out = np.zeros(saturated.shape, np.uint8)
    lab = imlabel(saturated)  # 2-connectivity
    if lab.max() > 0:
        sizes = np.bincount(lab.ravel())
        keep = sizes >= (mingrowarea if mingrowarea is not None else 0)
        keep[0] = False
        grow_seeds = keep[lab] & ~np.asarray(vis_veto, bool)
        if grow_seeds.any():
            selem = disk(int(grow_radius_px), dtype=bool)
            grown = ndimage.binary_dilation(grow_seeds, structure=selem)
            out[grown] = 2
    out[saturated & ~np.asarray(spec, bool)] = 1
    return out


def dilate_mask(binmask, radius_px: float) -> np.ndarray:
    """Iterated 3x3-cross dilation, ceil(radius) times
    (reference: masks_sds.py:252-272)."""
    buf = np.asarray(binmask, bool)
    for _ in range(int(np.ceil(radius_px))):
        buf = ndimage.binary_dilation(buf)
    return buf


def needed_bands(wavelengths, params: MaskParams):
    """Bands the mask tests actually read: the saturation window plus
    the cloud/specular/dark bands — ~80 of 425 on AVIRIS-NG. Shipping
    only these to the device cuts the host->TPU transfer (the full-cube
    bottleneck: the masks are elementwise; the tunnel is the cost)."""
    wl = np.asarray(wavelengths)
    lo, hi = params.saturation_window
    need = set(np.where((wl >= lo) & (wl <= hi))[0].tolist())
    need.update(int(b) for b in params.cld_bands)
    need.add(int(params.spec_band))
    need.add(int(params.dark_band))
    return np.array(sorted(need), dtype=np.int64)


def _compact_params(params: MaskParams, need) -> MaskParams:
    """Remap band indices into the compacted band axis."""
    pos = {int(b): i for i, b in enumerate(need)}
    return params._replace(
        cld_bands=tuple(pos[int(b)] for b in params.cld_bands),
        spec_band=pos[int(params.spec_band)],
        dark_band=pos[int(params.dark_band)])


def masks_for_cube(read_block=None, nrows: int = None, ncols: int = None,
                   wavelengths=None,
                   params: MaskParams = MaskParams(),
                   maskgrowradius_px: float = None, mingrowarea=None,
                   cldbfr_px: float = 0.0, block_step: int = 500,
                   nodata_row0=None, device=None,
                   read_block_bands=None):
    """Stream a flightline in line blocks and assemble the 4-band mask.

    read_block(r0, r1) -> (rows, cols, bands) float block of ALL bands
    (the needed ~80-band subset is sliced here), or supply
    ``read_block_bands(r0, r1, bands) -> (rows, cols, len(bands))``
    which reads ONLY the needed bands — the disk-efficient path
    (core.directio reads just those byte runs).
    Returns (rows, cols, 4) int16: [cloud(buffered), specular, flare, dark]
    (reference: masks_sds.py:284-348).

    ``device``: optional jax.Device for the per-block kernel. The masks
    are elementwise threshold tests — arithmetic intensity ~1 — so when
    the accelerator sits behind a slow interconnect the host->device
    transfer dominates; ``device=jax.devices("cpu")[0]`` keeps the same
    jitted kernel on the host backend (identical outputs, no transfer).

    Disk reads are double-buffered (core.prefetch.BlockPrefetcher): the
    next line block is read + band-compacted in a background thread
    while the current block's mask kernel runs — the reference reads
    synchronously inside the loop (masks_sds.py:289-296).

    ``nodata_row0`` may be a callable evaluated AFTER the streaming loop
    — lets the caller collect the nodata mask during its own
    ``read_block`` instead of a separate full-band pre-read.
    """
    import contextlib
    import jax as _jax
    from ..core.prefetch import BlockPrefetcher
    dev_ctx = (_jax.default_device(device) if device is not None
               else contextlib.nullcontext())
    wl_full = np.asarray(wavelengths, np.float32)
    need = needed_bands(wl_full, params)
    params = _compact_params(params, need)
    with dev_ctx:
        wavelengths = jnp.asarray(wl_full[need])
    sat_full = np.zeros((nrows, ncols), np.uint8)
    cloud_full = np.zeros((nrows, ncols), np.uint8)
    spec_full = np.zeros((nrows, ncols), np.uint8)
    dark_full = np.zeros((nrows, ncols), np.uint8)
    flare_full = np.zeros((nrows, ncols), np.uint8)

    overlap = int(np.ceil((mingrowarea or 0)
                          + (maskgrowradius_px or 0)))
    block_length = block_step + overlap
    starts = list(range(0, nrows, block_step))

    def _read(bi):
        r0 = starts[bi]
        r1 = min(nrows, r0 + block_length)
        if read_block_bands is not None:
            blk = np.asarray(read_block_bands(r0, r1, need), np.float32)
        else:
            blk = np.asarray(read_block(r0, r1), np.float32)[:, :, need]
        if blk.shape[0] < block_length:
            # pad to the fixed block shape so one jit executable serves
            # every block; -9999 rows trip none of the mask tests
            blk = np.concatenate(
                [blk, np.full((block_length - blk.shape[0],) + blk.shape[1:],
                              -9999.0, np.float32)], axis=0)
        # host-side input of the flare growth: stashed OUTSIDE the
        # prefetcher payload — returning it would device_put the bool
        # map to the accelerator only for grow_flare_mask to pull it
        # straight back through the tunnel (r3 review finding)
        vetoes[bi] = np.asarray(blk[: r1 - r0, :, params.spec_band]
                                >= params.vis_grow_threshold)
        return blk

    vetoes: dict = {}
    for bi, blk in BlockPrefetcher(_read, len(starts), device=device):
        vis_veto = vetoes.pop(bi)
        r0 = starts[bi]
        r1 = min(nrows, r0 + block_length)
        with dev_ctx:
            sat, cloud, spec, dark = (np.asarray(m)[: r1 - r0] for m in
                                      pixel_masks(blk, wavelengths, params))
        spec_full[r0:r1][spec] = 1
        cloud_full[r0:r1][cloud] = 1
        dark_full[r0:r1][dark] = 1
        sat_full[r0:r1][sat] = 1
        if maskgrowradius_px is not None:
            fl = grow_flare_mask(sat, spec, np.asarray(vis_veto),
                                 maskgrowradius_px, mingrowarea)
            flare_full[r0:r1] = np.maximum(flare_full[r0:r1], fl)

    cloud_buf = dilate_mask(cloud_full, cldbfr_px) if cldbfr_px else \
        cloud_full.astype(bool)

    out = np.zeros((nrows, ncols, 4), np.int16)
    out[..., 0] = cloud_buf
    out[..., 1] = spec_full
    out[..., 2] = flare_full
    out[..., 3] = dark_full
    if callable(nodata_row0):
        nodata_row0 = nodata_row0()
    if nodata_row0 is not None:
        out[np.asarray(nodata_row0)] = -9999
    return out
