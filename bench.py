"""Benchmark: every flagship srcfinder_tpu number, driver-captured.

Headline metric (unchanged): full-flightline FCN shift-and-stitch
saliency. The reference's fastest published number is 50 s on 4x Tesla
M60 for the 669x2801 benchmark scene (cnn/README.md:301) = 0.0375
Mpix/s; this runs the identical workload (GoogLeNet-1ch FCN, scale 32,
all 1024 shifts, stitch, nodata stamp) on one TPU chip with random
weights (trained .pt files are stripped upstream; weights do not affect
throughput) and reports Mpix/s with vs_baseline = ours / reference-best.

Round-3 widening (VERDICT r2 item 2): the other flagship paths are now
timed in the same run so round-over-round regressions are visible in
BENCH_r*.json — all at benchmark-scene scale on synthetic in-RAM data:

- cmf_full_scene_s     unimodal columnwise robust MF (201-alpha LOOCV),
                       col_chunk 256 over 669 columns x 71 active bands
                       (reference: ~214 s serial f64 loop, BASELINE.md)
- cmf_multimodal_s     same scene with 3 background modes (PCA+k-means)
- masks_s              4-band spectrometer mask, line-block streaming on
                       the HOST backend (the shipped config: the kernel
                       is elementwise/transfer-bound through the tunnel)
- exact_cnn_s          exact dense sliding-window CNN, 1.87M windows,
                       batch 4096 scanned 64 batches/dispatch
                       (reference: 0.5 h on 4x M60)
- fcn_batchN_mpix_s    campaign-throughput mode: N copies of the scene
                       through fcn_phase_saliency_batch (one executable,
                       N x wider MXU batches; N from
                       SRCFINDER_BENCH_SCENES, default 2 — the stage-3
                       feature set is ~2.7 GB/scene bf16 and N=4
                       exceeds the v5e's 16 GB HBM)
- fcn_blocked_s        halo-blocked FCN at its 12,000-line design point
                       (3 windows through one executable; the long-
                       flightline capability the reference lacks)
- train_step_s         SAM training step at the reference geometry:
                       GoogLeNet-1ch, 256x256 tiles, batch 32, weighted
                       CE, 2 fwd+bwd per step, BN stats on pass 1 only
                       (median of >= 5 warm steps; train_ex_s = ex/s)
- e2e_s                full srcfinder-pipeline CLI soak at benchmark
                       scale (2.85 GB radiance on disk; fused CMF+masks
                       single-pass read + FCN + salience + IME + wind
                       enrichment): FIRST of SRCFINDER_BENCH_E2E_RUNS
                       (default 3) fresh-process runs — what a cold box
                       pays; per-stage timers in e2e_stages, the fused
                       stage's read+masks/cmf split in e2e_phases
- e2e_warm_s           median of the remaining fresh-process runs: the
                       production steady state (compile cache hot, shm
                       arena pages resident — SCALING.md "Host memory");
                       all runs in e2e_s_all
- e2e_health_mb_s      host page-supply probe (fresh-anon first-touch
                       MB/s) taken before each e2e run: degraded probes
                       (< ~200 MB/s) mark runs whose host-path timings
                       measure the hypervisor, not the framework
- tunnel_h2d_mb_s      measured host->device bandwidth through the axon
                       tunnel (utils/accelprobe) at e2e time; per-child
                       measurements + the routed CMF backend ride in
                       e2e_h2d_mb_s / e2e_cmf_backend — the r5 fix for
                       the warm>cold e2e mystery (SCALING.md): the CMF
                       column loop routes device-vs-host by this number
- e2e_fcn_contact_s    per-child first-device-contact stall (the warm
                       thread's weight commit, this process's first
                       tunnel use): minutes under degraded link state
                       (433 s for 1 MB measured r5) — the evidence that
                       separates a slow fcn stage into link weather vs
                       code (SCALING.md "The per-process first-contact
                       stall")
- e2e_steady_s         marginal time of a SECOND flightline inside one
                       process — the per-flightline cost a watch-mode
                       deployment worker (srcfinder-jobs) pays once the
                       per-process stall + staging are amortized; the
                       production steady state proper (both pair times
                       in e2e_steady_pair_s)
- regressions          >10% round-over-round slips vs the newest
                       BENCH_r*.json, incl. flattened e2e stage timers
                       (empty list = clean); when non-empty, fresh page
                       + link probes ride in regressions_page_probe_mb_s
                       / regressions_h2d_mb_s so each slip is resolvable
                       to code vs host state vs tunnel weather

Each extra section is fail-soft: an error lands in the JSON as
``<name>_error`` instead of losing the whole line.

Roofline context (VERDICT r2 item 4): analytic FLOPs AND lower-bound
HBM bytes for the FCN pass (utils/flops), reporting the roofline
lower-bound seconds, which side binds, and the fraction of roofline
achieved.

Timing: median of SRCFINDER_BENCH_ITERS (default 3) warm runs, each
forced by np.asarray (block_until_ready returns early through the axon
tunnel); exact_cnn reports its first (compile-inclusive) run and the
median of 2 warm runs separately.

Env overrides: SRCFINDER_BENCH_DTYPE=float32|bfloat16,
SRCFINDER_BENCH_CHUNKS=a,b,c,d, SRCFINDER_BENCH_ITERS=n,
SRCFINDER_BENCH_FULL=0 (headline FCN metric only).

Prints exactly ONE JSON line.
"""

import json
import os
import time

import numpy as np

BASELINE_MPIX_S = (669 * 2801 / 1e6) / 50.0  # 4x M60, 50 s
H, W = 2801, 669  # benchmark scene ang20200924t211102 (lines x samples)
B_ACTIVE = 71     # CH4 radiance active window 351..422 (cmf/README.md)


def _median_time(run, iters):
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return float(np.median(times)), times


def host_page_probe(mb: int = 256, budget_s: float = 3.0) -> float:
    """Hypervisor page-supply health: MB/s of first-touch writes into
    FRESH anonymous memory (4 KB stride via a raw mmap, deliberately
    bypassing the alloccache shim's pooled/arena blocks). This is the
    one number that separates a healthy host (700-1500 MB/s) from a
    degraded one (9-114 MB/s) on this VM — SCALING.md "Host memory" —
    so every variance-prone host-path timing records it as exculpatory
    evidence: a slip WITH a degraded probe is hypervisor weather, a
    slip under a healthy probe is a code regression (VERDICT r4
    items 1/4/8). Time-bounded: in degraded states touching the full
    buffer would itself take minutes."""
    import mmap as _mmap
    total = mb << 20
    chunk = 16 << 20
    buf = _mmap.mmap(-1, total)
    a = np.frombuffer(buf, np.uint8)
    try:
        touched = 0
        t0 = time.time()
        for off in range(0, total, chunk):
            a[off:off + chunk:4096] = 1
            touched += chunk
            if time.time() - t0 > budget_s:
                break
        dt = max(time.time() - t0, 1e-9)
        return round(touched / dt / 1e6, 1)
    finally:
        del a                 # release the exported buffer before close
        buf.close()


def bench_fcn(out, dtype_name, chunks, iters):
    import jax
    import jax.numpy as jnp
    from srcfinder_tpu.models.googlenet import googlenet, fold_inference
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    from srcfinder_tpu.detect.preprocess import preprocess_ch4, \
        norm_for_model
    from srcfinder_tpu.utils.flops import (fcn_phase_flops,
                                           fcn_phase_bytes,
                                           tpu_peak_flops,
                                           roofline_seconds)

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0,
                      dtype=dtype)
    # init on the host backend: eager init on the remote-TPU backend
    # pays the ~31.5 ms tunnel dispatch constant per tiny op (hundreds
    # of them) — fold_inference commits the folded tree to the TPU with
    # ONE device_put (the CLI startup pattern, SCALING.md)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)), train=False)
    # the shipped inference transform: parallel 1x1 convs widened + BN
    # folded into conv weights — what every prediction CLI runs
    model, variables = fold_inference(model, variables)

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

    sal = run()                       # warmup: compile the executables
    assert np.isfinite(sal[sal != -9999]).all()
    elapsed, times = _median_time(run, iters)

    flops = fcn_phase_flops(model, variables, (H, W))
    bytes_lb = fcn_phase_bytes(model, variables, (H, W), dtype=dtype)
    peak = tpu_peak_flops()
    rl_s, rl_bound = roofline_seconds(flops, bytes_lb)
    mpix_s = (H * W / 1e6) / elapsed
    out.update({
        "metric": "fcn_flightline_saliency_throughput",
        "value": round(mpix_s, 4),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
        "dtype": dtype_name,
        "iters": iters,
        "time_s_median": round(elapsed, 4),
        "time_s_all": [round(t, 4) for t in times],
        "fcn_layout": "wide",      # r4 default (chip A/B in SCALING.md)
        "achieved_tflops": round(flops / elapsed / 1e12, 3),
        "mfu": round(flops / elapsed / peak, 4) if peak else None,
        "hbm_bytes_lb_gb": round(bytes_lb / 1e9, 1),
        "roofline_s": round(rl_s, 4) if rl_s else None,
        "roofline_bound": rl_bound,
        "roofline_frac": round(rl_s / elapsed, 3) if rl_s else None,
    })
    return model, variables, band


def bench_fcn_batch(out, model, variables, band, nscenes, iters):
    import jax.numpy as jnp
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency_batch
    from srcfinder_tpu.detect.preprocess import preprocess_ch4, \
        norm_for_model

    mean, std = norm_for_model("multi_64")
    x = preprocess_ch4(jnp.asarray(band), mean, std)
    xs = jnp.stack([x] * nscenes)

    def run():
        return np.asarray(fcn_phase_saliency_batch(model, variables, xs))

    run()
    elapsed, _ = _median_time(run, iters)
    out[f"fcn_batch{nscenes}_mpix_s"] = round(
        nscenes * (H * W / 1e6) / elapsed, 4)
    out[f"fcn_batch{nscenes}_s"] = round(elapsed, 4)


def bench_fcn_blocked(out, model, variables, iters):
    """Halo-blocked FCN at its long-flightline design point: a 12,000-
    line synthetic scene (3 windows of block+2*halo lines through ONE
    executable). The capability the reference lacks (VRAM cliff at
    cnn/README.md:171), hardware-proven per VERDICT r3 item 5."""
    import jax.numpy as jnp
    from srcfinder_tpu.detect.fcn_pipeline import (TRUNK_HALO, _auto_block,
                                                   fcn_phase_saliency_blocked)

    hl = int(os.environ.get("SRCFINDER_BENCH_BLOCKED_LINES", "12000"))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(hl, W)).astype(np.float32),
                      jnp.bfloat16)

    def run():
        return np.asarray(fcn_phase_saliency_blocked(model, variables,
                                                     img))

    sal = run()
    assert sal.shape == (hl, W) and np.isfinite(sal).all()
    elapsed, _ = _median_time(run, iters)
    out["fcn_blocked_lines"] = hl
    out["fcn_blocked_block"] = _auto_block(W, TRUNK_HALO, 32)
    out["fcn_blocked_s"] = round(elapsed, 4)
    out["fcn_blocked_mpix_s"] = round(hl * W / 1e6 / elapsed, 4)


def bench_cmf(out, iters):
    import jax.numpy as jnp
    from srcfinder_tpu.cmf import matched_filter as mfmod

    rng = np.random.default_rng(1)
    cube = (np.abs(rng.normal(4.0, 0.5, (H, W, B_ACTIVE)))
            .astype(np.float32) + 0.5)
    abscf = jnp.asarray((-np.abs(rng.normal(size=B_ACTIVE)) * 0.1)
                        .astype(np.float32))
    alphas = jnp.asarray(mfmod.default_alphas(np.float32))
    chunk = 256
    nblk = -(-W // chunk)
    blocks = []
    for bi in range(nblk):
        blk = cube[:, bi * chunk:(bi + 1) * chunk, :]
        if blk.shape[1] < chunk:
            blk = np.concatenate(
                [blk, np.zeros((H, chunk - blk.shape[1], B_ACTIVE),
                               np.float32)], axis=1)
        blocks.append(jnp.asarray(blk))
    masks = [mfmod.valid_mask(b).astype(jnp.float32) for b in blocks]

    def run_uni():
        res = [mfmod.matched_filter_columns(b, m, abscf, alphas)
               for b, m in zip(blocks, masks)]
        return [np.asarray(r.mf) for r in res]

    def run_multi():
        res = [mfmod.matched_filter_columns_multimodal(
            b, m, abscf, alphas, bgmodes=3, pcadim=6)
            for b, m in zip(blocks, masks)]
        return [np.asarray(r.mf) for r in res]

    run_uni()
    out["cmf_full_scene_s"] = round(_median_time(run_uni, iters)[0], 4)
    run_multi()
    out["cmf_multimodal_s"] = round(_median_time(run_multi, iters)[0], 4)


def bench_masks(out, iters):
    import jax
    from srcfinder_tpu.masks.sds import MaskParams, masks_for_cube

    # needed-band subset at AVIRIS-NG resolution: the saturation window
    # 1945-2485 nm is ~108 of 425 bands; build exactly that band axis
    wl = np.concatenate([[450., 505., 670., 1250., 2139.],
                         np.linspace(1945., 2485., 108)]).astype(np.float32)
    params = MaskParams(cld_bands=(0, 2, 3), dark_band=4, spec_band=1)
    rng = np.random.default_rng(2)
    cube = np.abs(rng.normal(1.0, 0.5, (H, W, wl.size))).astype(np.float32)
    cube[100:130, 100:140, 60] = 7.5            # saturated region
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    def run():
        return masks_for_cube(lambda r0, r1: cube[r0:r1], H, W, wl,
                              params=params, maskgrowradius_px=48.0,
                              mingrowarea=5, cldbfr_px=48.0,
                              device=cpu)

    run()
    out["masks_s"] = round(_median_time(run, iters)[0], 4)


def bench_train(out, iters):
    """SAM training step at the reference's geometry (VERDICT r4
    item 6): GoogLeNet-1ch, 256x256 tiles, batch 32, class-weighted CE
    (weights ~9-23, cnn/training/README.md:110-138), SAM rho=2.0
    adaptive wrapping SGD(momentum .9, wd 5e-4) — 2 fwd+bwd per step,
    BN running stats updated on the first pass only (reference:
    cnn/training/experiment_script_all.py:346-381). Matches
    train.train_experiment's setup exactly (same model init, optimizer,
    jitted step); each timed step includes the float(loss) sync the
    production epoch loop pays per batch. Reports the median warm step
    and examples/s; the M60 reference has no published step time — the
    epoch wall-clock in its README transcripts is the comparable."""
    import jax
    import jax.numpy as jnp
    from srcfinder_tpu.models.googlenet import googlenet
    from srcfinder_tpu.train.sam import (TrainState, make_inner_optimizer,
                                         make_sam_train_step)

    batch, crop = 32, 256
    model = googlenet(num_classes=2)
    key = jax.random.PRNGKey(0)
    key, kinit, kdrop = jax.random.split(key, 3)
    # init + optimizer-state zeros on the host backend (eager ops on the
    # remote-TPU backend pay ~31.5 ms tunnel dispatch EACH), then commit
    # the whole train state with one device_put transfer
    optimizer = make_inner_optimizer()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init({"params": kinit, "dropout": kdrop},
                               jnp.zeros((1, crop, crop, 1)), train=True)
        state = TrainState(variables["params"], variables["batch_stats"],
                           optimizer.init(variables["params"]))
    state = jax.device_put(state)
    step = make_sam_train_step(model, optimizer,
                               jnp.asarray([1.0, 9.2]))  # CalCH4_v8-like
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(0.0, 1.0, (batch, crop, crop, 1))
                         .astype(np.float32))
    labels = jnp.asarray((rng.random(batch) > 0.9).astype(np.int32))

    def run():
        nonlocal state, key
        key, sub = jax.random.split(key)
        state, loss = step(state, images, labels, 1e-4, sub)
        return float(loss)

    loss0 = run()                                # compile
    assert np.isfinite(loss0)
    elapsed, times = _median_time(run, max(iters, 5))
    out["train_step_s"] = round(elapsed, 4)
    out["train_step_s_all"] = [round(t, 4) for t in times]
    out["train_ex_s"] = round(batch / elapsed, 1)


def bench_exact_cnn(out, dtype_name, model, variables, band):
    """First run reported separately (compile-inclusive when the
    persistent cache is cold); exact_cnn_s is the median of 2 warm
    runs so the headline can't mix compile time in (VERDICT r3 item 6)."""
    import jax.numpy as jnp
    from srcfinder_tpu.detect.cnn_pipeline import cnn_saliency_image

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    def run():
        sal = np.asarray(cnn_saliency_image(
            band, variables, model_name="multi_64", dim=256, batch=4096,
            method="exact", dtype=dtype, model=model, superbatch=64))
        assert np.isfinite(sal[sal != -9999]).all()

    t0 = time.time()
    run()
    out["exact_cnn_first_s"] = round(time.time() - t0, 1)
    elapsed, times = _median_time(run, 2)
    out["exact_cnn_s"] = round(elapsed, 1)
    out["exact_cnn_s_all"] = [round(t, 1) for t in times]


def bench_e2e(out):
    """Full srcfinder-pipeline soak at benchmark scale (VERDICT r3
    item 2, medianized + health-probed r5 per VERDICT r4 item 1): a
    2801 x 598 x 425 f32 BIL radiance (2.85 GB on disk, synthetic
    plume) through SRCFINDER_BENCH_E2E_RUNS (default 3) fresh CLI
    subprocesses with every stage on — fused single-pass CMF+masks
    read, FCN saliency, plume list, IME, wind/emission enrichment.

    Reported: e2e_s (first run — what a cold box pays), e2e_warm_s
    (median of the remaining fresh-process runs — the production
    steady state: compile cache hot, shm arena pages resident),
    e2e_s_all (every run), e2e_health_mb_s (the host page-supply
    probe taken immediately before each run — the exculpatory
    evidence that tells hypervisor weather from code regressions),
    e2e_stages (per-run [STAGE] timers) and e2e_phases (the fused
    stage's [PHASE] split: host-bound read+masks vs tunnel/TPU-bound
    cmf — per run, so a slow run is attributable)."""
    import re
    import subprocess
    import sys

    base = "/tmp/bench_e2e"
    rdn = os.path.join(base, "ang20260818t000000_rdn_v2y1_img")
    libf = os.path.join(base, "ang_ch4_unit_3col_425chan.txt")
    wf = os.path.join(base, "w.npz")
    if not os.path.exists(rdn):            # fixture: built once, untimed
        os.makedirs(base, exist_ok=True)
        from srcfinder_tpu.core.envi import save_envi
        rng = np.random.default_rng(7)
        L, C, B = H, 598, 425
        cube = np.abs(rng.normal(4.0, 0.5, (L, C, B))
                      .astype(np.float32)) + 0.5
        absorb = np.ones(B, np.float32)
        absorb[360:410] = 0.9
        cube[1200:1260, 200:240] *= absorb          # synthetic plume
        meta = {"data ignore value": -9999,
                "map info": ["UTM", "1", "1", "272247.15", "3992010.65",
                             "3.1", "3.1", "11", "North", "WGS-84",
                             "units=Meters", "rotation=0"],
                "wavelength": [f"{w:.2f}"
                               for w in np.linspace(380, 2500, B)]}
        save_envi(rdn + ".hdr", cube, metadata=meta, interleave="bil")
        del cube
        lib = np.zeros((425, 3))
        lib[:, 0] = np.arange(1, 426)
        lib[:, 1] = np.linspace(380, 2500, 425)
        lib[:, 2] = -np.abs(np.random.default_rng(8).normal(size=425)) * .1
        np.savetxt(libf, lib)
        import jax
        import jax.numpy as jnp
        from srcfinder_tpu.models import googlenet as _g
        from srcfinder_tpu.detect.cnn_cli import save_weights
        m = _g(num_classes=2, dropout=0.0, dropout_aux=0.0)
        # fixture-only weights: init on the host — on the default (axon)
        # device this one-off init was observed to cost ~5 min of remote
        # compiles (truncated_normal per layer, r5 cache mtimes)
        with jax.default_device(jax.devices("cpu")[0]):
            save_weights(wf, m.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 1)),
                                    train=False))
        for day, hh in (("20260817", 23), ("20260818", 0),
                        ("20260818", 1)):
            d = os.path.join(base, "winds", "hrrr", day)
            os.makedirs(d, exist_ok=True)
            u = np.full((5, 5), 3.0, np.float32)
            v = np.full((5, 5), 4.0, np.float32)
            lat, lon = np.meshgrid(np.linspace(35.5, 36.5, 5),
                                   np.linspace(-120.5, -119.5, 5),
                                   indexing="ij")
            np.savez(os.path.join(d, f"hrrr.{day}{hh:02d}.wrfsfcf00.npz"),
                     u=u, v=v, lat=lat, lon=lon, gust=np.hypot(u, v),
                     valid_date=f"{day[:4]}-{day[4:6]}-{day[6:]}"
                                f"T{hh:02d}:00:00")

    outdir = os.path.join(base, "out")
    import shutil
    cmd = [sys.executable, "-m", "srcfinder_tpu.flow.pipeline_cli", rdn,
           "--library", libf, "--weights", wf, "-o", outdir,
           "--ime", "--masks", "--winds", os.path.join(base, "winds"),
           "--wind-ext", ".npz", "--col_chunk", "256",
           "--prob_thr", "0.0", "--ppmm_thr", "500",
           "--fcn-dtype", "bfloat16"]
    # session link state, for the record (the same probe drives the CMF
    # device-vs-host routing inside each child — SCALING.md "The e2e
    # warm>cold mystery": h2d bandwidth through the tunnel is weather,
    # 75 -> 12 -> ~1 MB/s across rounds, and unmeasured it is
    # indistinguishable from a code regression)
    try:
        from srcfinder_tpu.utils.accelprobe import h2d_probe
        p = h2d_probe()
        if p:
            out["tunnel_h2d_mb_s"] = p["mb_s"]
            out["tunnel_h2d_overhead_s"] = p["overhead_s"]
    except Exception:
        pass
    runs = int(os.environ.get("SRCFINDER_BENCH_E2E_RUNS", "3"))
    times, stages_all, phases_all, health = [], [], [], []
    backends, h2d_all, contact = [], [], []
    for _ in range(runs):
        shutil.rmtree(outdir, ignore_errors=True)
        health.append(host_page_probe())
        t0 = time.time()
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=2400)
        dt = round(time.time() - t0, 1)
        stages = {mt.group(1): float(mt.group(2)) for mt in re.finditer(
            r"\[STAGE\] (.+?) done in ([0-9.]+)s", res.stdout)}
        phases = {mt.group(1): float(mt.group(2)) for mt in re.finditer(
            r"\[PHASE\] (.+?) done in ([0-9.]+)s", res.stdout)}
        # the child's routed CMF backend + its own link measurement
        pm = re.search(r"\[PROBE\] cmf backend (\w+): (.*)", res.stdout)
        backends.append(pm.group(1) if pm else None)
        bm = re.search(r"h2d ([0-9.]+) MB/s", pm.group(2)) if pm else None
        h2d_all.append(float(bm.group(1)) if bm else None)
        # the child's first-device-contact stall (SCALING.md "The
        # per-process first-contact stall"): a slow fcn stage with a
        # large contact probe is link weather, not code
        cm = re.search(r"\[PROBE\] fcn first device contact "
                       r".* in ([0-9.]+)s", res.stdout)
        contact.append(float(cm.group(1)) if cm else None)
        if res.returncode != 0:
            out["e2e_error"] = (res.stderr or res.stdout).strip()[-200:]
            out["e2e_health_mb_s"] = health
            return
        times.append(dt)
        stages_all.append(stages)
        phases_all.append(phases)
    # first run = what a cold box pays; the rest are the production
    # steady state (compile cache hot, shm arena pages resident)
    out["e2e_s"] = times[0]
    out["e2e_stages"] = stages_all[0]
    out["e2e_s_all"] = times
    out["e2e_health_mb_s"] = health
    out["e2e_phases"] = phases_all
    out["e2e_cmf_backend"] = backends
    out["e2e_h2d_mb_s"] = h2d_all
    out["e2e_fcn_contact_s"] = contact
    if len(times) > 1:
        warm = times[1:]
        out["e2e_warm_s"] = float(np.median(warm))
        # stages of the run closest to the warm median (attributable)
        wi = 1 + int(np.argmin([abs(t - out["e2e_warm_s"])
                                for t in warm]))
        out["e2e_warm_stages"] = stages_all[wi]

    # Production steady state: a deployment worker (srcfinder-jobs /
    # --watch) processes MANY flightlines per process, paying the
    # per-process first-contact stall and compile staging ONCE
    # (SCALING.md "The per-process first-contact stall") — every
    # fresh-process number above includes that per-process tax. Run a
    # SECOND flightline (same bytes, new name/outdir) inside one
    # process and report its marginal time: the per-flightline cost a
    # watch-mode worker actually pays.
    rdn2 = os.path.join(base, "ang20260818t000001_rdn_v2y1_img")
    if not os.path.exists(rdn2):
        os.symlink(rdn, rdn2)                # same 2.85 GB, zero disk
        shutil.copyfile(rdn + ".hdr", rdn2 + ".hdr")
    winds = os.path.join(base, "winds")
    pair_dirs = (outdir + "_p1", outdir + "_p2")
    for d in pair_dirs:
        shutil.rmtree(d, ignore_errors=True)
    code = (
        "import time, json\n"
        "from srcfinder_tpu.utils.config import ensure_alloc_cache\n"
        "ensure_alloc_cache()\n"
        "from srcfinder_tpu.utils import default_compile_cache\n"
        "default_compile_cache()\n"
        "from srcfinder_tpu.flow.pipeline_cli import run_flightline\n"
        "ts = []\n"
        f"for rdn, od in [({rdn!r}, {pair_dirs[0]!r}),\n"
        f"                ({rdn2!r}, {pair_dirs[1]!r})]:\n"
        "    t0 = time.time()\n"
        f"    run_flightline(rdn, {libf!r}, {wf!r}, od,\n"
        "                   prob_thr=0.0, ppmm_thr=500.0, do_masks=True,\n"
        f"                   do_ime=True, winds={winds!r},\n"
        "                   wind_ext='.npz', col_chunk=256,\n"
        "                   fcn_dtype='bfloat16')\n"
        "    ts.append(round(time.time() - t0, 1))\n"
        "print('STEADY ' + json.dumps(ts))\n")
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=2400)
        sm = re.search(r"STEADY (\[.*\])", res.stdout)
        if sm:
            pair = json.loads(sm.group(1))
            out["e2e_steady_pair_s"] = pair
            out["e2e_steady_s"] = pair[-1]
        else:
            out["e2e_steady_error"] = (res.stderr or
                                       res.stdout).strip()[-200:]
    except Exception as e:
        out["e2e_steady_error"] = str(e).split("\n")[0][:200]


def check_regressions(out):
    """Cross-round guard (VERDICT r3 item 7): diff this run against the
    newest BENCH_r*.json the driver recorded; >10% worse on any shared
    numeric key lands in ``regressions`` (fail-soft, never raises)."""
    import glob
    import re as _re
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    out["regressions"] = []
    if not files:
        return
    try:
        prev = json.load(open(files[-1])).get("parsed") or {}
    except Exception:
        return
    out["regressions_vs"] = os.path.basename(files[-1])
    # flatten the per-stage e2e timer dicts so stage-level slips are
    # diffed too, not just the totals (VERDICT r4 item 8)
    def _flat(d):
        flat = dict(d)
        for pk in ("e2e_stages", "e2e_warm_stages"):
            for sk, sv in (d.get(pk) or {}).items():
                flat[f"{pk}.{sk}_s"] = sv
        return flat
    cur = _flat(out)
    for k, old in _flat(prev).items():
        new = cur.get(k)
        if not (isinstance(old, (int, float)) and
                isinstance(new, (int, float)) and old > 0):
            continue
        if k == "value" or k.endswith("_mpix_s"):     # rate: higher wins
            if new < old * 0.90:
                out["regressions"].append(f"{k}: {old} -> {new}")
        elif k.endswith("_mb_s"):                     # probes: informational
            continue
        elif _re.search(r"_s$|_s_median$", k):        # time: lower wins
            # stage timers are sub-second and jitter with CPU
            # contention; require 0.3 s absolute on top of the 10% so
            # "ime: 0.4 -> 0.5" noise doesn't dilute real slips
            floor = 0.3 if k.startswith(("e2e_stages.",
                                         "e2e_warm_stages.")) else 0.0
            if new > old * 1.10 and (new - old) > floor:
                out["regressions"].append(f"{k}: {old} -> {new}")
    if out["regressions"]:
        # exculpatory evidence: a flagged slip under a degraded page
        # probe is hypervisor weather, not code (SCALING.md "Host
        # memory"); a slip with every probe healthy is a real
        # regression. Probes taken during the run ride in
        # masks_host_mb_s / e2e_health_mb_s; this one is "now".
        try:
            out["regressions_page_probe_mb_s"] = host_page_probe()
        except Exception:
            pass
        # link weather: TPU-path slips (exact_cnn_first_s, e2e totals)
        # under a degraded h2d probe are tunnel state, not code
        try:
            from srcfinder_tpu.utils.accelprobe import h2d_probe
            p = h2d_probe(refresh=True)
            if p:
                out["regressions_h2d_mb_s"] = p["mb_s"]
        except Exception:
            pass


def main():
    # host allocator shim first (re-execs once if built): without it the
    # VM's free page reporting re-faults every recycled GB-scale host
    # buffer at 1-50 MB/s and the host-path timings (masks, preprocess)
    # measure the hypervisor, not the framework (SCALING.md)
    from srcfinder_tpu.utils.config import ensure_alloc_cache
    ensure_alloc_cache()

    # Watchdog: the remote TPU compile service has been observed to hang
    # indefinitely (2026-08-17/18, backend init blocked for hours) and
    # the hang holds the GIL, so no in-process alarm/thread can fire —
    # a SIGALRM watchdog was measured to NEVER run during the hang.
    # Supervisor pattern instead: the benchmark runs in a CHILD process
    # that emits per-section partials; the parent enforces the deadline
    # with SIGKILL (GIL-proof) and always prints exactly one JSON line,
    # merged from whatever sections completed. The budget covers a fully
    # cold compile set (~30-40 min observed) with slack for the r4
    # additions (warm exact-CNN medians + the e2e soak's own shapes);
    # SRCFINDER_BENCH_TIMEOUT_S=0 disables the supervisor.
    budget = int(os.environ.get("SRCFINDER_BENCH_TIMEOUT_S", "7200"))
    if budget > 0 and os.environ.get("SRCFINDER_BENCH_CHILD") != "1":
        import subprocess
        import sys
        import threading
        env = dict(os.environ, SRCFINDER_BENCH_CHILD="1")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
        merged = {}
        final = None
        timer = threading.Timer(budget, child.kill)
        timer.start()
        try:
            for line in child.stdout:
                line = line.strip()
                if line.startswith("BENCHPART "):
                    try:
                        merged.update(json.loads(line[10:]))
                    except ValueError:
                        pass
                elif line.startswith("{"):
                    final = line
        finally:
            timer.cancel()
            rc = child.wait()
        if final is not None and rc == 0:
            print(final)
            return 0
        merged.setdefault("metric", "fcn_flightline_saliency_throughput")
        merged.setdefault("value", None)
        merged.setdefault("unit", "Mpix/s")
        merged.setdefault("vs_baseline", None)
        merged["error"] = (f"watchdog: child rc={rc} within {budget}s "
                           "(TPU compile service unresponsive?)")
        print(json.dumps(merged))
        return 3

    def _part(d):
        # progress partials for the supervisor (harmless when absent)
        print("BENCHPART " + json.dumps(d), flush=True)

    import jax
    # persistent compile cache: TPU (remote) compiles dominate cold runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype_name = os.environ.get("SRCFINDER_BENCH_DTYPE", "bfloat16")
    chunks = tuple(int(c) for c in os.environ.get(
        "SRCFINDER_BENCH_CHUNKS", "2,4,8,1").split(","))
    iters = int(os.environ.get("SRCFINDER_BENCH_ITERS", "3"))
    full = os.environ.get("SRCFINDER_BENCH_FULL", "1") != "0"

    out = {}
    if full:
        # HOST-ONLY section first, in a CPU-pinned subprocess: any jax
        # call in THIS process initializes the remote-TPU backend, which
        # hangs for the whole watchdog budget when the tunnel is down
        # (observed 2026-08-17/18) — running masks out-of-process means
        # even a dead-tunnel BENCH line carries real data.
        try:
            import subprocess
            import sys
            code = ("import jax, json\n"
                    "jax.config.update('jax_platforms', 'cpu')\n"
                    "import bench\n"
                    "out = {}\n"
                    "out['masks_host_mb_s'] = bench.host_page_probe()\n"
                    f"bench.bench_masks(out, {iters})\n"
                    "print('BENCHJSON ' + json.dumps(out))\n")
            res = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=1200,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in res.stdout.splitlines():
                if line.startswith("BENCHJSON "):
                    out.update(json.loads(line[10:]))
        except Exception as e:
            out["masks_error"] = str(e).split("\n")[0][:200]
        _part(out)

    model, variables, band = bench_fcn(out, dtype_name, chunks, iters)
    _part(out)
    if full:
        nsc = int(os.environ.get("SRCFINDER_BENCH_SCENES", "2"))
        sections = [
            ("fcn_batch", lambda: bench_fcn_batch(out, model, variables,
                                                  band, nsc, iters)),
            ("fcn_blocked", lambda: bench_fcn_blocked(out, model,
                                                      variables, iters)),
            ("cmf", lambda: bench_cmf(out, iters)),
            ("train", lambda: bench_train(out, iters)),
            ("exact_cnn", lambda: bench_exact_cnn(out, dtype_name, model,
                                                  variables, band)),
            ("e2e", lambda: bench_e2e(out)),
        ]
        for name, fn in sections:
            try:
                fn()
            except Exception as e:   # keep the line printable
                out[f"{name}_error"] = str(e).split("\n")[0][:200]
            _part(out)
    check_regressions(out)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
