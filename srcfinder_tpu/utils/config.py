"""Runtime configuration helpers.

The reference scatters env-var switches across modules (SURVEY §5 config
inventory); the TPU framework's runtime knobs live here.
"""

from __future__ import annotations

import os

__all__ = ["default_compile_cache"]


def default_compile_cache(path: str | None = None) -> str:
    """Enable jax's persistent compilation cache with a sensible default.

    TPU compiles are expensive and (without this) per-process; every CLI
    entry point calls this so repeat invocations are warm. Respects
    ``JAX_COMPILATION_CACHE_DIR`` when already set.
    """
    import jax
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "srcfinder_tpu_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
