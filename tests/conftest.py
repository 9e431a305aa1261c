"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require the real TPU; multi-chip sharding is validated on
virtual CPU devices exactly as the driver's dryrun does.
"""

import os

# XLA_FLAGS must be set before the CPU client is created.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# This environment force-registers the axon TPU platform ignoring
# JAX_PLATFORMS (jax.config.jax_platforms arrives as "axon,cpu"); pin the
# test session to CPU explicitly so tests never ride the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has a single CPU core, so cold
# XLA compiles dominate test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_envi(tmp_path):
    """Factory writing a synthetic ENVI image, returns (hdr_path, array)."""
    from srcfinder_tpu.core.envi import save_envi

    def _make(name, arr, metadata=None, interleave="bil"):
        hdr = str(tmp_path / f"{name}.hdr")
        save_envi(hdr, arr, metadata=metadata, interleave=interleave)
        return hdr[:-4], arr

    return _make
