"""Shared runtime utilities (config, logging glue)."""

from .config import default_compile_cache
from .profiling import StageTimer, device_trace
