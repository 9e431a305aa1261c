"""CLI: the full flightline pipeline in one command.

The reference chains its stages through AWS events — an S3 plume-list
upload triggers compute-ime, masks, msf-flow Batch jobs
(msf_flow/deployment/README.md:1-27) — so there is no single local
entry point. This framework's local-first equivalent:

    srcfinder-pipeline RADIANCE --library LIB --weights W.npz -o OUT
        [--winds WINDS_DIR --wind-ext .npz] [--ime] [...]

runs radiance -> CMF -> FCN saliency -> plume candidates (xlsx+csv)
[-> IME stats] [-> wind/emission enrichment], with per-stage idempotent
skips (existing outputs are reused — the reference's resume convention,
SURVEY §5 checkpoint/resume) and per-stage wall-clock timers.

``--watch DIR`` instead consumes new radiance files from a directory
(DirWatcher + JobQueue — the S3-event analog) and keeps going on
per-flightline failures like every reference loop does.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

__all__ = ["run_flightline", "main"]


def _finalize(*pairs):
    """Atomically promote ``<file>.part`` products to their final names
    (img + .hdr). A stage killed mid-write must NOT leave a final-named
    partial product — the idempotent [SKIP] logic would trust it on the
    next run (SURVEY §5 checkpoint/resume)."""
    for part, final in pairs:
        for ext in ("", ".hdr"):
            if os.path.exists(part + ext):
                os.replace(part + ext, final + ext)


def _stage(name, timers, progress):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            progress(f"[STAGE] {name}")
            return self

        def __exit__(self, *exc):
            timers[name] = time.time() - self.t0
            progress(f"[STAGE] {name} done in {timers[name]:.1f}s")
    return _T()


def _warm_fcn_async(nrows, ncols, weights, model_name, method, fcn_dtype,
                    fcn_saliency_image):
    """Stage the FCN saliency executable (weights load + fold + ONE
    committed upload + compile-cache fetch + one dummy pass on zeros)
    in a daemon thread while the cmf+masks stage streams the cube —
    same overlap rationale as cmf.pipeline.warm_tpu_async (SCALING.md
    "CLI startup"). The weights go through fcn_pipeline.
    load_saliency_model, so the real fcn stage reuses the committed
    tree and the in-process jit cache (it re-uploaded its own copy
    before r5 — two ~12-24 MB transfers, minutes under degraded tunnel
    bandwidth). Advisory only: failures surface in the real stage.

    The [PROBE] lines are stall evidence: the weight commit is this
    process's FIRST device contact, and through the axon tunnel that
    first contact stalls for minutes under degraded link state (433 s
    for 1 MB measured r5, then 0.6 s for the next 12 MB — SCALING.md
    "The per-process first-contact stall"). A slow fcn stage with a
    large contact probe is link weather; with a small one it is code.
    bench.py collects them per e2e child as e2e_fcn_contact_s."""
    if not weights:
        return None

    def _warm():
        try:
            import numpy as np
            import jax
            import jax.numpy as jnp
            from ..detect.fcn_pipeline import load_saliency_model
            fdt = jnp.bfloat16 if fcn_dtype == "bfloat16" else jnp.float32
            t0 = time.time()
            model, variables = load_saliency_model(
                weights, model_name=model_name, dtype=fdt)
            print(f"[PROBE] fcn first device contact (weight commit) "
                  f"in {time.time() - t0:.1f}s", flush=True)
            z = np.zeros((nrows, ncols), np.float32)
            # block_until_ready (not np.asarray): the executable is
            # staged at dispatch; fetching the dummy saliency would
            # drag ~7 MB back through the tunnel for nothing
            jax.block_until_ready(fcn_saliency_image(
                z, variables, model_name=model_name, method=method,
                dtype=fdt, model=model))
            print(f"[PROBE] fcn executable staged in "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception:
            pass

    import threading
    t = threading.Thread(target=_warm, name="fcn-warm", daemon=True)
    t.start()
    return t


def run_flightline(radiance: str, library: str, weights: str, outdir: str,
                   model_name: str = "multi_64", bgmodes: int = 1,
                   prob_thr: float = 0.5, ppmm_thr: float = 250.0,
                   method: str = "auto", winds: str | None = None,
                   wind_ext: str = ".grib2", do_ime: bool = False,
                   do_masks: bool = False, quicklooks: bool = False,
                   dtype="float32", fcn_dtype: str = "float32",
                   col_chunk: int = 256, progress=print):
    """Run all stages for one flightline; returns dict of products."""
    import numpy as np
    from ..core import envi as envi_io
    from ..core.geo import mapinfo
    from ..cmf.pipeline import robust_mf_image
    from ..detect.fcn_pipeline import fcn_saliency_image
    from ..detect.salience import salience2detections, save_detections

    os.makedirs(outdir, exist_ok=True)
    base = os.path.basename(radiance)
    stem = os.path.splitext(base)[0]
    lid = stem.split("_")[0]
    products: dict = {}
    timers: dict = {}

    # ---- L2 + L2b: CMF and spectrometer masks ---------------------------
    # Both stages consume the raw radiance. When both need computing they
    # are FUSED onto one streaming pass: the masks stage's (prefetched,
    # overlapped) line-block read also fills the CMF's active-band +
    # RGB slabs in RAM, so the multi-GB cube is read from disk ONCE —
    # matching the reference's touch-the-cube-once property
    # (masks_sds.py:289-296, robust_mf.py:297-298; VERDICT r2 item 1).
    cmff = os.path.join(outdir, stem.replace("_rdn", "_cmf")
                        if "_rdn" in stem else stem + "_cmf")
    products["cmf"] = cmff
    # saliency product path is derived from cmff alone — computed HERE so
    # the fused stage knows whether the fcn stage will even run (the warm
    # thread must not burn the single chip staging an executable for a
    # stage that will be [SKIP]ped — r4 advisor finding)
    salf = os.path.join(outdir, os.path.basename(cmff) + "_saliency")
    need_cmf = not os.path.exists(cmff)
    if not need_cmf:
        progress(f"[SKIP] CMF exists: {cmff}")

    need_masks = False
    mskname = mskf = None
    if do_masks:
        from ..masks.cli import mask_output_name
        mskname = mask_output_name(stem)
        mskf = os.path.join(outdir, mskname)
        products["masks"] = mskf
        if os.path.exists(mskf):
            progress(f"[SKIP] masks exist: {mskf}")
        else:
            need_masks = True

    def _host_device():
        # host backend: the mask kernel is elementwise / transfer-bound
        # (see masks/sds.masks_for_cube)
        import jax
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:
            return None

    fused = False
    if need_cmf and need_masks:
        from ..masks.cli import masks_for_flightline
        from ..core import envi as envi_io
        from ..cmf.pipeline import active_range_for_library
        with _stage("cmf+masks (fused single-pass read)", timers,
                    progress):
            rdn = envi_io.open_envi(radiance)
            L, C = rdn.nrows, rdn.ncols
            a0, a1 = active_range_for_library(library)
            a0 -= 1
            rgb_bands = (60, 42, 24)
            # start accelerator init + CMF executable staging NOW, in a
            # daemon thread: ~20-30 s of per-process tunnel/compile-
            # server latency overlaps the streaming read below instead
            # of serializing after it (SCALING.md "CLI startup")
            from ..cmf.pipeline import warm_tpu_async
            warm_tpu_async(L, col_chunk, a1 - a0, bgmodes=bgmodes,
                           dtype=np.dtype(dtype).type)
            # and the FCN executable behind it (same process, same
            # rationale: its staging otherwise serializes into the fcn
            # stage) — the CMF product has the radiance's (L, C) dims,
            # so the saliency executable's signature is known already.
            # Skipped when the saliency product already exists: the fcn
            # stage will be [SKIP]ped, and a full-scene dummy pass would
            # only compete with the CMF for the single chip (and could
            # be mid-TPU-call at interpreter shutdown on fast runs).
            if not os.path.exists(salf):
                _warm_fcn_async(L, C, weights, model_name, method,
                                fcn_dtype, fcn_saliency_image)
            slab = np.empty((L, C, a1 - a0), np.float32)
            rgb = np.empty((L, C, 3), np.float32)

            def tap(r0, r1, blk, pos):
                # active range stays a contiguous run inside the union
                # band list, so positions pos[a0]..pos[a1-1] are
                # consecutive (masks/cli.read_block_bands)
                p0 = pos[a0]
                slab[r0:r1] = blk[:, :, p0:p0 + (a1 - a0)]
                rgb[r0:r1] = blk[:, :, [pos[b] for b in rgb_bands]]

            # [PHASE] timers split the fused stage for bench.py: the
            # read+masks phase is host-bound (disk + page supply), the
            # cmf phase is tunnel/TPU-bound — a cold/warm discrepancy
            # is attributable only with this split (VERDICT r4 item 1)
            t_ph = time.time()
            try:
                masks_for_flightline(radiance, outdir,
                                     out_name=mskname + ".part",
                                     device=_host_device(), tap=tap,
                                     tap_bands=(list(range(a0, a1))
                                                + list(rgb_bands)))
            except (ValueError, RuntimeError) as e:
                # no wavelength metadata / no meter map-info for the grow
                # radii: masks are a skippable QC add-on — the detection
                # chain must still run (CMF falls through to its own pass)
                progress(f"[WARN] fused masks failed, masks skipped: {e}")
                products["masks"] = None
            else:
                progress(f"[PHASE] read+masks done in "
                         f"{time.time() - t_ph:.1f}s")
                t_ph = time.time()
                robust_mf_image(radiance, library, cmff + ".part",
                                bgmodes=bgmodes,
                                dtype=np.dtype(dtype).type,
                                col_chunk=col_chunk,
                                rgb_bands=rgb_bands,
                                preloaded=(slab, rgb))
                progress(f"[PHASE] cmf done in {time.time() - t_ph:.1f}s")
                _finalize((mskf + ".part", mskf), (cmff + ".part", cmff))
                fused = True
            need_masks = False

    if need_cmf and not fused:
        with _stage("cmf", timers, progress):
            robust_mf_image(radiance, library, cmff + ".part",
                            bgmodes=bgmodes, dtype=np.dtype(dtype).type,
                            col_chunk=col_chunk)
            _finalize((cmff + ".part", cmff))

    if need_masks and not fused:
        from ..masks.cli import masks_for_flightline
        with _stage("masks", timers, progress):
            try:
                masks_for_flightline(radiance, outdir,
                                     out_name=mskname + ".part",
                                     device=_host_device())
                _finalize((mskf + ".part", mskf))
            except (ValueError, RuntimeError) as e:
                progress(f"[WARN] masks skipped: {e}")
                products["masks"] = None

    # ---- L3: FCN saliency ----------------------------------------------
    products["saliency"] = salf
    if os.path.exists(salf):
        progress(f"[SKIP] saliency exists: {salf}")
    else:
        with _stage("fcn", timers, progress):
            from ..detect.fcn_pipeline import load_saliency_model
            img = envi_io.open_envi(cmff)
            band = np.asarray(img.read_band(-1), dtype=np.float32)
            import jax.numpy as jnp
            fdt = jnp.bfloat16 if fcn_dtype == "bfloat16" else jnp.float32
            # memoized: reuses the warm thread's folded+committed tree
            model, variables = load_saliency_model(
                weights, model_name=model_name, dtype=fdt)
            sal = np.asarray(fcn_saliency_image(band, variables,
                                                model_name=model_name,
                                                method=method, dtype=fdt,
                                                model=model))
            meta = {"data ignore value": -9999}
            if "map info" in img.metadata:
                meta["map info"] = img.metadata["map info"]
            envi_io.save_envi(salf + ".part.hdr", sal.astype(np.float32),
                              metadata=meta, interleave="bip")
            _finalize((salf + ".part", salf))

    # ---- L4: candidates --------------------------------------------------
    detdir = os.path.join(outdir, os.path.basename(cmff) + "_detections")
    detname = "_".join([os.path.basename(cmff), "v2",
                        f"minsal{prob_thr:.2f}",
                        f"minppmm{ppmm_thr:.1f}"]).replace(".", "p")
    xlsxf = os.path.join(detdir, detname + ".xlsx")
    csvf = os.path.splitext(xlsxf)[0] + ".csv"
    products["detections_xlsx"] = xlsxf
    products["detections_csv"] = csvf
    if os.path.exists(csvf):
        progress(f"[SKIP] detections exist: {csvf}")
    else:
        with _stage("salience", timers, progress):
            os.makedirs(detdir, exist_ok=True)
            cmfimg = envi_io.open_envi(cmff)
            salimg = envi_io.open_envi(salf)
            salmm = salimg.load().squeeze()
            cmfmm = cmfimg.load()
            detdf = salience2detections(salmm, cmfmm, prob_thr, ppmm_thr,
                                        lid, mapinfo(cmfimg), detdir,
                                        quicklooks=quicklooks)
            if len(detdf):
                save_detections(xlsxf, detdf)
            else:
                progress("[INFO] no detections above thresholds")
                products["detections_xlsx"] = None
                products["detections_csv"] = None

    # ---- L5a: IME --------------------------------------------------------
    if do_ime:
        imef = os.path.join(outdir, os.path.basename(cmff) + "_ime.csv")
        products["ime_csv"] = imef
        if os.path.exists(imef):
            progress(f"[SKIP] IME exists: {imef}")
        else:
            with _stage("ime", timers, progress):
                from .ime_worker import compute_ime_for_cmf
                compute_ime_for_cmf(cmff, out_csv=imef)

    # ---- L5b: winds / emissions ------------------------------------------
    if winds and products.get("detections_csv") \
            and os.path.exists(products["detections_csv"]):
        outcsv = os.path.join(outdir, stem + "_plumes_enriched.csv")
        products["enriched_csv"] = outcsv
        if os.path.exists(outcsv):
            progress(f"[SKIP] enriched list exists: {outcsv}")
        else:
            with _stage("msf-flow", timers, progress):
                from .msf_flow import process_plumes, insert_plumes_in_file
                # the plume list name carries the minppmm tag the
                # orchestrator parses (msf_flow.py:124-144)
                tagged = os.path.join(
                    outdir, f"{stem}_plumes_minppmm{int(ppmm_thr)}.csv")
                import pandas as pd
                pdf = pd.read_csv(products["detections_csv"])
                imef = products.get("ime_csv")
                if imef and os.path.exists(imef):
                    # attach AvgIMEdivFetch20/StdIMEdivFetch20/Aspect
                    # ratio20 so the emission stage has its inputs (the
                    # reference's compute-ime job updates the plume list
                    # the same way before msf-flow consumes it)
                    from .ime_worker import merge_ime_into_plumelist
                    try:
                        ime_df = pd.read_csv(imef)
                    except pd.errors.EmptyDataError:   # zero detections
                        ime_df = pd.DataFrame()
                    merge_ime_into_plumelist(pdf, ime_df)
                pdf.to_csv(tagged, index=False)
                plumes = process_plumes([tagged], winds, ext=wind_ext)
                insert_plumes_in_file(plumes, outcsv)

    products["timers"] = timers
    return products


def build_parser():
    p = argparse.ArgumentParser(
        description="srcfinder TPU: radiance -> CMF -> saliency -> "
                    "plume list [-> IME -> winds] in one command")
    p.add_argument("radiance", nargs="?", default=None,
                   help="radiance flightline (ENVI)")
    p.add_argument("--library", required=True,
                   help="unit-absorption library (name selects the gas "
                        "window, e.g. *ch4*.txt)")
    p.add_argument("--weights", required=True,
                   help="FCN weights (.npz or .pt)")
    p.add_argument("--outdir", "-o", default=".")
    p.add_argument("--model", default="multi_64")
    p.add_argument("--bgmodes", "-k", type=int, default=1)
    p.add_argument("--prob_thr", type=float, default=0.5)
    p.add_argument("--ppmm_thr", type=float, default=250.0)
    p.add_argument("--method", default="auto",
                   choices=["auto", "shift", "phase", "dilated"])
    p.add_argument("--winds", default=None, help="wind-grid directory "
                   "(enables the emission stage)")
    p.add_argument("--wind-ext", default=".grib2")
    p.add_argument("--ime", action="store_true")
    p.add_argument("--fcn-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="FCN trunk dtype (bfloat16 = MXU-native, ~4x the "
                        "f32 stage speed; saliency delta bounded by "
                        "tests/test_detect.py at ~1e-4)")
    p.add_argument("--masks", action="store_true",
                   help="also generate the 4-band spectrometer QC mask\n                   (needs wavelength metadata in the radiance header)")
    p.add_argument("--quicklooks", action="store_true")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64"])
    p.add_argument("--col_chunk", type=int, default=256)
    p.add_argument("--watch", default=None,
                   help="watch a directory for new radiance files "
                        "instead of processing one")
    p.add_argument("--watch-regex", default=r".*_rdn.*img$")
    p.add_argument("--once", action="store_true",
                   help="with --watch: process the current backlog and "
                        "exit (for tests/cron)")
    return p


def main(argv=None):
    if argv is None:  # owning the process: allow the re-exec
        from ..utils.config import ensure_alloc_cache
        ensure_alloc_cache()
    from ..utils import default_compile_cache

    args = build_parser().parse_args(argv)
    default_compile_cache()
    kwargs = dict(library=args.library, weights=args.weights,
                  outdir=args.outdir, model_name=args.model,
                  bgmodes=args.bgmodes, prob_thr=args.prob_thr,
                  ppmm_thr=args.ppmm_thr, method=args.method,
                  winds=args.winds, wind_ext=args.wind_ext,
                  do_ime=args.ime, do_masks=args.masks,
                  fcn_dtype=args.fcn_dtype,
                  quicklooks=args.quicklooks,
                  dtype=args.dtype, col_chunk=args.col_chunk)

    if args.watch:
        from .deploy import JobQueue, watch_and_trigger
        jobq = JobQueue()
        jobq.register("flightline",
                      lambda params: run_flightline(params["path"],
                                                    **kwargs))
        first = True
        while True:
            # first cycle processes the existing backlog (the DirWatcher
            # cursor starts at 'now' when no state file exists)
            watch_and_trigger(args.watch, "flightline", jobq,
                              regex=args.watch_regex, force=first)
            first = False
            jobq.join()
            for failure in jobq.failures:
                print(f"[FAIL] {failure}", file=sys.stderr)
            if args.once:
                return 1 if jobq.failures else 0
            time.sleep(5)

    if not args.radiance:
        print("radiance file or --watch required", file=sys.stderr)
        return 2
    products = run_flightline(args.radiance, **kwargs)
    for k, v in products.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
