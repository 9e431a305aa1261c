"""Pallas TPU kernels for the hot paths that XLA cannot fuse itself."""

from .trunk_fuse import fused_trunk_segment, trunk_segment_params  # noqa: F401
