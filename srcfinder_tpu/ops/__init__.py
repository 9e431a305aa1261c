"""Pallas TPU kernels for the hot paths that XLA cannot fuse itself."""

from .trunk_fuse import fused_stage12, trunk_params_from_variables  # noqa: F401
