"""CLI: FCN shift-and-stitch saliency map
(reference: cnn/fcn_pred_pipeline.py:98-147).

usage: srcfinder-fcn-pred FLIGHTLINE [FLIGHTLINE ...] -m multi_64 -w W.npz

With multiple flightlines, scenes are batched ``--scene-batch`` at a
time through ONE phase-dedup executable (campaign-throughput mode —
the MXU-filling batch the single-scene path lacks; see
detect.fcn_pipeline.fcn_phase_saliency_batch). Scenes in a batch are
zero-padded to the batch's max (H, W) and cropped after — identical to
each scene's own divisibility padding away from it, bit-identical for
same-shaped scenes (tests/test_detect.py).
"""

from __future__ import annotations

import os
import sys
import time

from .cnn_cli import build_parser as _cnn_parser, load_weights, _run


def build_parser():
    p = _cnn_parser()
    p.description = "Generate flightline saliency maps with a FCN (TPU)."
    p.add_argument("--scale", "-s", type=int, default=32,
                   help="Downscaling factor of the model")
    p.add_argument("--scene-batch", type=int, default=2,
                   help="flightlines per device batch in campaign mode "
                        "(2 fits the v5e's 16 GB HBM at benchmark scale)")
    for action in p._actions:
        if action.dest == "method":
            # repurpose the inherited --method flag for FCN paths
            action.choices = ["auto", "shift", "phase", "phase-blocked",
                              "dilated"]
            action.default = "auto"
            action.help = ("auto (phase when scale==32; line-blocked past "
                           "SRCFINDER_FCN_MAX_LINES lines), shift "
                           "(per-shift batches), phase, phase-blocked "
                           "(halo-exact long-flightline mode), dilated")
        elif action.dest == "flightline":
            action.nargs = "+"
            action.help = "Flightline ENVI IMG path(s)"
        elif action.dest == "dtype":
            # the FCN CLI's historical default is f32 (bf16 is opt-in,
            # like the pipeline's --fcn-dtype); the CNN CLI defaults bf16
            action.default = "float32"
    return p


def _run_campaign(args):
    """N flightlines -> N saliency maps, scenes batched through
    fcn_phase_saliency_batch."""
    import numpy as np
    import jax.numpy as jnp
    from ..core import envi as envi_io
    from ..models.googlenet import GoogLeNet, fold_inference
    from ..utils.config import default_compile_cache
    from .fcn_pipeline import fcn_phase_saliency_batch
    from .preprocess import preprocess_ch4, norm_for_model

    default_compile_cache()
    if not args.weights or not os.path.isfile(args.weights):
        print(f"[INFO] Model weights not found at {args.weights}, exiting.")
        return 1
    variables = load_weights(args.weights)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, variables = fold_inference(GoogLeNet(num_classes=2, dtype=dtype),
                                      variables)
    mean, std = norm_for_model(args.model)
    os.makedirs(args.output or ".", exist_ok=True)

    paths = list(args.flightline)
    n = args.scene_batch
    for i in range(0, len(paths), n):
        group = paths[i:i + n]
        t0 = time.time()
        imgs, bands, metas = [], [], []
        for pth in group:
            img = envi_io.open_envi(pth)
            band = np.asarray(img.read_band(args.band - 1),
                              dtype=np.float32)
            bands.append(band)
            metas.append(img.metadata)
        hmax = max(b.shape[0] for b in bands)
        wmax = max(b.shape[1] for b in bands)
        xs = np.zeros((len(group), hmax, wmax), np.float32)
        for k, b in enumerate(bands):
            xs[k, :b.shape[0], :b.shape[1]] = np.asarray(
                preprocess_ch4(jnp.asarray(b, dtype), mean, std),
                np.float32)
        # HBM guard: a long/wide scene (or too many per group) would
        # OOM the batched executable — run such groups scene-by-scene,
        # through the halo-blocked variant when a single scene alone
        # exceeds the unblocked ceiling (fcn_pipeline)
        from .fcn_pipeline import (MAX_UNBLOCKED_PX, fcn_phase_saliency,
                                   fcn_phase_saliency_blocked)
        max_px = int(os.environ.get("SRCFINDER_FCN_MAX_PX",
                                    MAX_UNBLOCKED_PX))
        if hmax * wmax * len(group) > max_px:
            print(f"[INFO] {len(group)}x{hmax}x{wmax} exceeds the "
                  "batched-HBM budget; running scenes singly")
            sal_fn = (fcn_phase_saliency_blocked
                      if hmax * wmax > max_px else fcn_phase_saliency)
            sals = np.stack([np.asarray(sal_fn(model, variables,
                                               jnp.asarray(xs[k], dtype)))
                             for k in range(len(group))])
        else:
            sals = np.asarray(fcn_phase_saliency_batch(
                model, variables, jnp.asarray(xs, dtype)))
        for k, (pth, b) in enumerate(zip(group, bands)):
            sal = sals[k, :b.shape[0], :b.shape[1]].astype(np.float32)
            sal = np.where(b == -9999.0, -9999.0, sal)
            stem = os.path.splitext(os.path.basename(pth))[0]
            outf = os.path.join(args.output, f"{stem}_saliency")
            meta = {"data ignore value": -9999}
            if "map info" in metas[k]:
                meta["map info"] = metas[k]["map info"]
            envi_io.save_envi(outf + ".hdr", sal, metadata=meta,
                              interleave="bip")
            print(f"[INFO] Saved to {outf}")
        print(f"[INFO] batch of {len(group)} scenes in "
              f"{time.time() - t0:.1f}s")
    print("Done!")
    return 0


def main(argv=None):
    if argv is None:  # owning the process: allow the re-exec
        from ..utils.config import ensure_alloc_cache
        ensure_alloc_cache()
    args = build_parser().parse_args(argv)
    if len(args.flightline) > 1:
        if args.method not in ("auto", "phase") or args.scale != 32:
            print("[ERROR] campaign mode uses the phase path (scale 32)",
                  file=sys.stderr)
            return 2
        return _run_campaign(args)
    args.flightline = args.flightline[0]
    from .fcn_pipeline import fcn_saliency_image

    def fn(band, variables):
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        return fcn_saliency_image(band, variables, model_name=args.model,
                                  scale=args.scale, batch=args.batch,
                                  method=args.method, dtype=dtype)

    return _run(args, fn)


if __name__ == "__main__":
    sys.exit(main())
