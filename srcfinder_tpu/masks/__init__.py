"""Spectrometer QC masks (reference: spectrometer_masks/masks_sds.py)."""

from .sds import (MaskParams, pixel_masks, grow_flare_mask, dilate_mask,
                  masks_for_cube, get_radius_in_pixels)
