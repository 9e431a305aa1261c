"""CLI: dense CNN saliency map (reference: cnn/cnn_pred_pipeline.py:62-121).

usage: srcfinder-cnn-pred FLIGHTLINE -m COVID_QC -w weights.pt -b 512 -o OUT

Differences from the reference CLI recorded here: ``--gpus`` is replaced
by the JAX device mesh (all visible devices are used automatically);
``--weights`` points at a checkpoint file (the reference resolves
cnn/models/<model>.pt, which this repo does not ship).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(
        description="Generate a flightline saliency map with a CNN (TPU).")
    p.add_argument("flightline", type=str, help="Flightline ENVI IMG path")
    p.add_argument("--model", "-m", default="COVID_QC",
                   choices=["COVID_QC", "CalCH4_v8", "Permian_QC",
                            "multi_256", "multi_64"],
                   help="Model name (sets normalization constants)")
    p.add_argument("--weights", "-w", default=None,
                   help=".pt (torch) or .npz (flax) checkpoint path")
    p.add_argument("--band", "-n", type=int, default=1,
                   help="1-based band to read")
    p.add_argument("--batch", "-b", type=int, default=4096,
                   help="windows per device batch (measured on v5e: "
                        "206/176/163 s full scene at 1024/2048/4096; "
                        "8192 exceeds HBM)")
    p.add_argument("--superbatch", type=int, default=64,
                   help="batches scanned per device dispatch (fori_loop "
                        "inside one executable, paying the dispatch "
                        "latency once per scan); 1 = per-batch dispatch")
    p.add_argument("--dim", type=int, default=256, help="window size")
    p.add_argument("--method", default="exact", choices=["exact", "fast"],
                   help="exact per-window forwards, or amortized dense")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="trunk compute dtype (bf16 is MXU-native; delta "
                        "vs f32 bounded by tests)")
    p.add_argument("--output", "-o", default=".", help="output directory")
    return p


def load_weights(path):
    """Load .pt (torch state dict) or .npz (flattened flax) weights."""
    from ..models.convert import load_pt
    if path.endswith(".pt"):
        return load_pt(path)
    import numpy as np
    flat = np.load(path, allow_pickle=False)
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_weights(path, variables):
    import numpy as np
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + [k])
            else:
                flat["/".join(prefix + [k])] = np.asarray(v)

    walk(variables, [])
    np.savez(path, **flat)


def _run(args, saliency_fn):
    import numpy as np
    from ..core import envi as envi_io
    from ..utils.config import default_compile_cache
    default_compile_cache()

    print("[STEP] MODEL INITIALIZATION")
    if not args.weights or not os.path.isfile(args.weights):
        print(f"[INFO] Model weights not found at {args.weights}, exiting.")
        return 1
    variables = load_weights(args.weights)

    print("[STEP] MODEL PREDICTION")
    img = envi_io.open_envi(args.flightline)
    band = np.asarray(img.read_band(args.band - 1), dtype=np.float32)
    t0 = time.time()
    sal = np.asarray(saliency_fn(band, variables))
    print(f"[INFO] saliency computed in {time.time() - t0:.1f}s")

    print("[STEP] RESULT EXPORT")
    os.makedirs(args.output or ".", exist_ok=True)
    stem = os.path.basename(args.flightline)
    stem = os.path.splitext(stem)[0]
    outf = os.path.join(args.output, f"{stem}_saliency")
    meta = {"data ignore value": -9999}
    if "map info" in img.metadata:
        meta["map info"] = img.metadata["map info"]
    envi_io.save_envi(outf + ".hdr", sal.astype(np.float32), metadata=meta,
                      interleave="bip")
    print(f"[INFO] Saved to {outf}")
    print("Done!")
    return 0


def main(argv=None):
    if argv is None:  # owning the process: allow the re-exec
        from ..utils.config import ensure_alloc_cache
        ensure_alloc_cache()
    args = build_parser().parse_args(argv)
    from .cnn_pipeline import cnn_saliency_image

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def fn(band, variables):
        return cnn_saliency_image(band, variables, model_name=args.model,
                                  dim=args.dim, batch=args.batch,
                                  method=args.method, dtype=dtype,
                                  superbatch=args.superbatch)

    return _run(args, fn)


if __name__ == "__main__":
    sys.exit(main())
