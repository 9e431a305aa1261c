"""utils.accelprobe: adaptive h2d ladder + TTL state-file cache (r5)."""

import json

import numpy as np
import pytest

import jax

from srcfinder_tpu.utils import accelprobe as ap


class _FakeDev:
    platform = "tpu"

    def __repr__(self):
        return "FakeTPU"


def _patch_link(monkeypatch, tmp_path, mb_s, overhead_s=0.0):
    """Simulate a link of the given speed and isolate the caches."""
    monkeypatch.setattr(
        ap, "_time_put",
        lambda nbytes, dev: overhead_s + nbytes / (mb_s * 1e6))
    monkeypatch.setattr(ap, "_CACHE", {})
    monkeypatch.setenv("SRCFINDER_H2D_STATE", str(tmp_path / "h2d.json"))


def test_probe_none_on_cpu_backend():
    # test env is CPU-pinned: the default device has no link to probe
    assert ap.h2d_probe(device=jax.devices("cpu")[0]) is None


def test_probe_healthy_link(monkeypatch, tmp_path):
    _patch_link(monkeypatch, tmp_path, mb_s=5000.0, overhead_s=0.03)
    res = ap.h2d_probe(device=_FakeDev())
    assert res["mb_s"] == pytest.approx(5000.0, rel=0.05)
    assert res["overhead_s"] == pytest.approx(0.03, abs=0.02)


def test_probe_degraded_link_two_point(monkeypatch, tmp_path):
    # r5 tunnel state: ~12 MB/s with ~1.5 s per-transfer cost
    _patch_link(monkeypatch, tmp_path, mb_s=12.0, overhead_s=1.5)
    res = ap.h2d_probe(device=_FakeDev())
    assert res["mb_s"] == pytest.approx(12.0, rel=0.05)
    assert res["overhead_s"] == pytest.approx(1.5, abs=0.1)


def test_probe_stalled_link_single_point(monkeypatch, tmp_path):
    # 0.01 MB/s (observed r5): 256 KB alone takes ~26 s; the probe must
    # not push more bytes, so only one (pessimistic) point is taken
    calls = []

    def slow_put(nbytes, dev):
        calls.append(nbytes)
        return nbytes / 0.01e6

    monkeypatch.setattr(ap, "_time_put", slow_put)
    monkeypatch.setattr(ap, "_CACHE", {})
    monkeypatch.setenv("SRCFINDER_H2D_STATE", str(tmp_path / "h2d.json"))
    res = ap.h2d_probe(device=_FakeDev())
    assert calls == [256 << 10]
    assert res["mb_s"] == pytest.approx(0.01, rel=0.05)


def test_probe_state_file_shared_across_processes(monkeypatch, tmp_path):
    _patch_link(monkeypatch, tmp_path, mb_s=42.0)
    first = ap.h2d_probe(device=_FakeDev())
    # a "fresh process" (empty in-proc cache, dead fake link) must reuse
    # the state file instead of re-measuring
    monkeypatch.setattr(ap, "_CACHE", {})
    monkeypatch.setattr(ap, "_time_put",
                        lambda *a: pytest.fail("re-measured within TTL"))
    assert ap.h2d_probe(device=_FakeDev()) == first
    # expired TTL -> re-measure
    st = json.load(open(str(tmp_path / "h2d.json")))
    st["ts"] -= 1e6
    json.dump(st, open(str(tmp_path / "h2d.json"), "w"))
    monkeypatch.setattr(ap, "_CACHE", {})
    _patch_link(monkeypatch, tmp_path, mb_s=99.0)
    assert ap.h2d_probe(device=_FakeDev())["mb_s"] == pytest.approx(
        99.0, rel=0.05)


def test_probe_refresh_bypasses_caches(monkeypatch, tmp_path):
    _patch_link(monkeypatch, tmp_path, mb_s=42.0)
    ap.h2d_probe(device=_FakeDev())
    _patch_link(monkeypatch, tmp_path, mb_s=7.0, overhead_s=1.6)
    res = ap.h2d_probe(device=_FakeDev(), refresh=True)
    assert res["mb_s"] == pytest.approx(7.0, rel=0.05)
