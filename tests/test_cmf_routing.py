"""Device-vs-host routing of the CMF column loop (r5).

The eigenbasis CMF is ~10 GFLOP/scene, so on a tunnel-attached
accelerator the slab upload dominates and its bandwidth is weather
(SCALING.md "The e2e warm>cold mystery": 75 -> 12 -> ~1 MB/s across
rounds). cmf/pipeline routes the loop to the host backend when the
measured link makes the upload slower than the calibrated host compute
— the same arithmetic-intensity adjudication that put the masks kernel
on the host (masks/sds). These tests drive _route_backend through
every decision branch and pin that both routes produce identical
products.
"""

import numpy as np
import pytest

import jax

from srcfinder_tpu.cmf import pipeline as pl
from srcfinder_tpu.core import envi as envi_io
from tests.test_cmf_pipeline import _write_flightline

CHUNK = 2801 * 256 * 71 * 4          # calibration-point slab bytes


def _with_probe(monkeypatch, probe):
    monkeypatch.setattr(pl, "_H2D", {"probe": probe})
    ev = pl._H2D_EVENT.__class__()
    ev.set()
    monkeypatch.setattr(pl, "_H2D_EVENT", ev)


def test_route_forced(monkeypatch):
    dev, why = pl._route_backend("device", CHUNK, 1, 1, np.float32)
    assert dev is None and why == "forced"
    dev, why = pl._route_backend("host", CHUNK, 1, 1, np.float32)
    assert dev.platform == "cpu" and why == "forced"
    with pytest.raises(ValueError):
        pl._route_backend("gpu", CHUNK, 1, 1, np.float32)


def test_route_f64_is_host(monkeypatch):
    # must not consult (or wait for) the probe: f64 is host-by-design
    monkeypatch.setattr(pl, "_H2D_EVENT", pl._H2D_EVENT.__class__())
    dev, why = pl._route_backend("auto", CHUNK, 1, 1, np.float64)
    assert dev.platform == "cpu"
    assert "float64" in why


def test_route_degraded_link_is_host(monkeypatch):
    # r5 measured state: 12.4 MB/s -> a 0.48 GB slab upload costs ~40 s
    # vs ~10 s host compute
    _with_probe(monkeypatch, {"mb_s": 12.4, "overhead_s": 1.5})
    dev, why = pl._route_backend("auto", 3 * CHUNK, 3, 1, np.float32)
    assert dev.platform == "cpu"
    assert "12.4 MB/s" in why


def test_route_fast_link_is_device(monkeypatch):
    # locally attached TPU: GB/s h2d keeps the device path
    _with_probe(monkeypatch, {"mb_s": 5000.0, "overhead_s": 0.0})
    dev, why = pl._route_backend("auto", 3 * CHUNK, 3, 1, np.float32)
    assert dev is None
    assert "5000" in why


def test_route_multimodal_threshold_differs(monkeypatch):
    # at 30 MB/s the unimodal host compute (~20 ns/B) beats the upload,
    # but the multimodal host cost (~90 ns/B) does not
    _with_probe(monkeypatch, {"mb_s": 30.0, "overhead_s": 0.0})
    uni, _ = pl._route_backend("auto", 3 * CHUNK, 3, 1, np.float32)
    multi, _ = pl._route_backend("auto", 3 * CHUNK, 3, 4, np.float32)
    assert uni.platform == "cpu"
    assert multi is None


def test_route_local_cpu_backend_is_default(monkeypatch):
    # probe None == the default backend IS the host: no pin needed
    _with_probe(monkeypatch, None)
    dev, why = pl._route_backend("auto", CHUNK, 1, 1, np.float32)
    assert dev is None


def test_route_probe_failure_or_timeout_is_host(monkeypatch):
    _with_probe(monkeypatch, "sentinel-will-be-missing")
    pl._H2D.clear()                       # probe raised -> key absent
    dev, why = pl._route_backend("auto", CHUNK, 1, 1, np.float32)
    assert dev.platform == "cpu" and "failed" in why
    # unset event + zero wait window = timed out -> degraded assumption
    monkeypatch.setattr(pl, "_H2D_EVENT", pl._H2D_EVENT.__class__())
    monkeypatch.setenv("SRCFINDER_CMF_PROBE_WAIT_S", "0")
    dev, why = pl._route_backend("auto", CHUNK, 1, 1, np.float32)
    assert dev.platform == "cpu" and "timed out" in why


def test_backend_routes_produce_identical_products(tmp_path, rng):
    """backend="host" and backend="device" write bit-identical CMF
    images (on the CPU-pinned test env both resolve to the same backend;
    the assertion pins the routed code path, not cross-device drift —
    cross-backend numerics are covered by the f32 envelope tests)."""
    infile, libf, x, lib = _write_flightline(tmp_path, rng)
    outs = {}
    for backend in ("host", "device"):
        outfile = str(tmp_path / f"cmf_{backend}")
        pl.robust_mf_image(infile, libf, outfile, dtype=np.float32,
                           col_chunk=4, backend=backend)
        outs[backend] = envi_io.open_envi(outfile).load()
    np.testing.assert_array_equal(outs["host"], outs["device"])


def test_backend_env_override(tmp_path, rng, monkeypatch, capsys):
    infile, libf, x, lib = _write_flightline(tmp_path, rng)
    monkeypatch.setenv("SRCFINDER_CMF_BACKEND", "host")
    pl.robust_mf_image(infile, libf, str(tmp_path / "cmf_env"),
                       dtype=np.float32, col_chunk=4)
    assert "[PROBE] cmf backend host: forced" in capsys.readouterr().out


def test_route_dead_link_is_host(monkeypatch):
    # a stalled tunnel rounds to mb_s 0.0 (256 KB in > ~50 s) — must
    # route host, not ZeroDivisionError (r5 smoke regression)
    _with_probe(monkeypatch, {"mb_s": 0.0, "overhead_s": 0.0})
    dev, why = pl._route_backend("auto", CHUNK, 1, 1, np.float32)
    assert dev.platform == "cpu"
    assert "dead" in why
