"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require the real TPU; multi-chip sharding is validated on
virtual CPU devices exactly as the driver's dryrun does.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
