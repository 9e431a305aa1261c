"""Pallas TPU kernels for the hot ops."""

from .moments import masked_moments_pallas
