"""The driver contract: ``__graft_entry__.dryrun_multichip`` must work in
a FRESH process with no environment help (no XLA_FLAGS, no JAX_PLATFORMS)
— it self-provisions its virtual CPU mesh. Round-1 regression: the driver
ran it on the ambient (1-device axon TPU) platform and it crashed
(MULTICHIP_r01.json rc=1)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_fresh_subprocess():
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         env=_clean_env(), capture_output=True, text=True,
                         timeout=1800)
    assert res.returncode == 0, f"stderr:\n{res.stderr[-4000:]}"


def test_dryrun_multichip_after_backend_init():
    """Even if a backend was already created (the driver compiles entry()
    first), dryrun_multichip must still succeed via its subprocess path."""
    code = (
        "import __graft_entry__ as g\n"
        # Simulate the worst case: ambient platform with too few devices.
        # Pinned via the config API — this box IGNORES the JAX_PLATFORMS
        # env var (CLAUDE.md), so an env pin would silently initialize
        # the axon TPU backend instead and hang the suite whenever the
        # tunnel is down (observed 2026-08-18).
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()  # force ambient backend creation\n"
        "g.dryrun_multichip(8)\n"
    )
    env = _clean_env()
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         env=env, capture_output=True, text=True,
                         timeout=1800)
    assert res.returncode == 0, f"stderr:\n{res.stderr[-4000:]}"
