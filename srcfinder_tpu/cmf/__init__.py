"""Columnwise robust matched filter (reference: cmf/robust_mf.py)."""

from .matched_filter import (PPM_SCALING, ACTIVE_RANGES, default_alphas,
                             valid_mask, masked_moments, MFResult,
                             matched_filter_columns, mf_column_stats)
