"""Runtime configuration helpers.

The reference scatters env-var switches across modules (SURVEY §5 config
inventory); the TPU framework's runtime knobs live here.
"""

from __future__ import annotations

import glob
import os
import sys

__all__ = ["default_compile_cache", "ensure_alloc_cache"]


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


def find_alloc_cache_so() -> str | None:
    """Path of the built large-allocation cache shim
    (native/alloccache.cpp), or None if it has not been built."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = sorted(glob.glob(os.path.join(pkg, "_alloccache*.so")))
    return hits[0] if hits else None


def ensure_alloc_cache() -> bool:
    """Re-exec the current process with the large-allocation cache shim
    LD_PRELOADed, if it is built and not already active.

    The shim (native/alloccache.cpp) retains freed >=4 MB blocks
    in-process instead of returning them to a guest kernel whose virtio
    free page reporting hands them to the hypervisor — re-faulting
    reported pages was measured at 1-50 MB/s on the deployment VM, which
    turned the ~7 s mask pass into 46-92 s (SCALING.md "Host memory:
    free page reporting"). Harmless (a plain block cache) on hosts
    without page reporting.

    Called by CLI entry points ONLY when they own the process
    (``argv is None`` — a caller passing argv explicitly, e.g. a test
    driving ``main([...])`` in-process, must not be re-exec'd).
    Returns True when the shim is active in this process. Opt out with
    ``SRCFINDER_ALLOC_CACHE=0``.
    """
    pre = os.environ.get("LD_PRELOAD", "")
    if "_alloccache" in pre:
        return True
    if os.environ.get("SRCFINDER_ALLOC_CACHE") == "0":
        return False
    so = find_alloc_cache_so()
    # sys.orig_argv preserves the exact interpreter invocation —
    # rebuilding from sys.argv[0] broke every `python -m pkg.mod` CLI
    # (the re-exec'd module lost its package and its relative imports
    # failed; r3 review finding)
    orig = list(getattr(sys, "orig_argv", []))
    if so is None or len(orig) < 2:
        return False
    env = dict(os.environ)
    env["LD_PRELOAD"] = f"{so} {pre}".strip()
    os.execve(sys.executable, orig, env)  # no return
