"""Benchmark: full-flightline FCN shift-and-stitch saliency on TPU.

Headline baseline (BASELINE.md): the reference's fastest published
full-flightline FCN saliency is 50 s on 4x Tesla M60 for the 669x2801
benchmark scene (cnn/README.md:301) = 0.0375 Mpix/s. This benchmark runs
the identical workload (GoogLeNet-1ch FCN, scale 32, all 1024 shifts,
stitch, nodata stamp) on one TPU chip with random weights (the trained
.pt files are stripped from the reference snapshot; weights do not affect
throughput) and reports Mpix/s with vs_baseline = ours / reference-best.

Uses the phase-deduplicated path (bit-exact vs the per-shift path — the
test suite asserts equality; detect/fcn_pipeline.fcn_phase_saliency).

Prints exactly ONE JSON line.
"""

import json
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

    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1)), train=False)

    rng = np.random.default_rng(0)
    band = np.abs(rng.normal(size=(H, W))).astype(np.float32) * 300.0
    band[:10, :10] = -9999.0
    mean, std = norm_for_model("multi_64")
    x = preprocess_ch4(jnp.asarray(band), mean, std)

    def run():
        sal = fcn_phase_saliency(model, variables, x, scale=32)
        sal = jnp.where(jnp.asarray(band) == -9999.0, -9999.0, sal)
        return np.asarray(sal)

    # warmup: compile the stage executables once
    run()

    # honest timing: np.asarray forces completion + device->host transfer
    # (block_until_ready alone reports early through the axon tunnel)
    t0 = time.time()
    sal = run()
    elapsed = time.time() - t0
    assert np.isfinite(sal[sal != -9999]).all()

    mpix_s = (H * W / 1e6) / elapsed
    print(json.dumps({
        "metric": "fcn_flightline_saliency_throughput",
        "value": round(mpix_s, 4),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
