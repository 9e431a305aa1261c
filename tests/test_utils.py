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


def test_bench_regression_guard(tmp_path, monkeypatch):
    """bench.check_regressions flags >10% slips against the newest
    BENCH_r*.json and leaves improvements alone (VERDICT r3 item 7)."""
    import json
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    prev = {"parsed": {"value": 2.0, "masks_s": 8.0, "exact_cnn_s": 100.0,
                       "fcn_batch2_mpix_s": 1.5, "time_s_all": [1, 2]}}
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(prev))
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path))
    out = {"value": 1.7,            # 15% slower rate -> flagged
           "masks_s": 8.4,          # 5% slower time -> ok
           "exact_cnn_s": 120.0,    # 20% slower time -> flagged
           "fcn_batch2_mpix_s": 2.0}  # improvement -> ok
    bench.check_regressions(out)
    assert out["regressions_vs"] == "BENCH_r03.json"
    flagged = {r.split(":")[0] for r in out["regressions"]}
    assert flagged == {"value", "exact_cnn_s"}

    out2 = {"value": 2.5, "masks_s": 7.0, "exact_cnn_s": 90.0}
    bench.check_regressions(out2)
    assert out2["regressions"] == []
