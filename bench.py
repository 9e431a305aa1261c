"""Benchmark: full-flightline FCN shift-and-stitch saliency on TPU.

Headline baseline (BASELINE.md): the reference's fastest published
full-flightline FCN saliency is 50 s on 4x Tesla M60 for the 669x2801
benchmark scene (cnn/README.md:301) = 0.0375 Mpix/s. This benchmark runs
the identical workload (GoogLeNet-1ch FCN, scale 32, all 1024 shifts,
stitch, nodata stamp) on one TPU chip with random weights (the trained
.pt files are stripped from the reference snapshot; weights do not affect
throughput) and reports Mpix/s with vs_baseline = ours / reference-best.

Uses the phase-deduplicated path (exact vs the per-shift path — the test
suite asserts equality; detect/fcn_pipeline.fcn_phase_saliency) with a
bfloat16 trunk (MXU-native; f32 accumulation inside the MXU). The
bf16-vs-f32 saliency delta is bounded by tests/test_detect.py.

Timing: median of SRCFINDER_BENCH_ITERS (default 3) warm runs, each
forced to completion by np.asarray (block_until_ready returns early
through the axon tunnel). Also reports achieved TFLOP/s and MFU from an
analytic conv/dot FLOP count (srcfinder_tpu.utils.flops).

Env overrides: SRCFINDER_BENCH_DTYPE=float32|bfloat16,
SRCFINDER_BENCH_CHUNKS=a,b,c,d, SRCFINDER_BENCH_ITERS=n.

Prints exactly ONE JSON line.
"""

import json
import os
import time

import numpy as np

BASELINE_MPIX_S = (669 * 2801 / 1e6) / 50.0  # 4x M60, 50 s
H, W = 2801, 669  # benchmark scene ang20200924t211102 (lines x samples)


def main():
    import jax
    # persistent compile cache: TPU (remote) compiles dominate cold runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from srcfinder_tpu.models.googlenet import googlenet
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    from srcfinder_tpu.detect.preprocess import preprocess_ch4, norm_for_model
    from srcfinder_tpu.utils.flops import fcn_phase_flops, tpu_peak_flops

    dtype_name = os.environ.get("SRCFINDER_BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    chunks = tuple(int(c) for c in os.environ.get(
        "SRCFINDER_BENCH_CHUNKS", "2,4,8,1").split(","))
    iters = int(os.environ.get("SRCFINDER_BENCH_ITERS", "3"))

    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0,
                      dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1)), train=False)

    rng = np.random.default_rng(0)
    band = np.abs(rng.normal(size=(H, W))).astype(np.float32) * 300.0
    band[:10, :10] = -9999.0
    mean, std = norm_for_model("multi_64")
    x = preprocess_ch4(jnp.asarray(band), mean, std)
    nodata = jnp.asarray(band) == -9999.0

    def run():
        sal = fcn_phase_saliency(model, variables, x, scale=32,
                                 chunks=chunks)
        sal = jnp.where(nodata, -9999.0, sal.astype(jnp.float32))
        return np.asarray(sal)

    # warmup: compile the stage executables once
    sal = run()
    assert np.isfinite(sal[sal != -9999]).all()

    # honest timing: np.asarray forces completion + device->host transfer
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    elapsed = float(np.median(times))

    flops = fcn_phase_flops(model, variables, (H, W))
    peak = tpu_peak_flops()
    tflops = flops / elapsed / 1e12
    mpix_s = (H * W / 1e6) / elapsed
    print(json.dumps({
        "metric": "fcn_flightline_saliency_throughput",
        "value": round(mpix_s, 4),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
        "dtype": dtype_name,
        "iters": iters,
        "time_s_median": round(elapsed, 4),
        "time_s_all": [round(t, 4) for t in times],
        "achieved_tflops": round(tflops, 3),
        "mfu": round(flops / elapsed / peak, 4) if peak else None,
    }))


if __name__ == "__main__":
    main()
