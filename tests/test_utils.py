"""Utility tests: stage timer, device trace, compile cache default."""

import os
import time

from srcfinder_tpu.utils import StageTimer, device_trace, default_compile_cache


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.total() >= 0.01
    rep = t.report()
    assert "a" in rep and "total" in rep


def test_device_trace(tmp_path):
    import jax.numpy as jnp
    with device_trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    # a trace plugin dir appears
    assert any("plugins" in r or f for r, d, f in os.walk(tmp_path))


def test_default_compile_cache(tmp_path, monkeypatch):
    import jax
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    p = default_compile_cache(str(tmp_path / "cc"))
    assert os.path.isdir(p)
    assert jax.config.jax_compilation_cache_dir == p
