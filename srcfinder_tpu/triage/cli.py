"""CLI: CMF column-profile generation
(reference: triage/cmf_profile.py:46-77 argparse surface).

usage: srcfinder-triage [-v] [--robust] [-j JOBS] [--outdir DIR]
       [--randomize] cmf_files...
"""

from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser("srcfinder-triage")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--robust", action="store_true",
                   help="Use robust statistics")
    p.add_argument("-j", "--jobs", type=int, default=1,
                   help="Number of parallel jobs (1 job per image)")
    p.add_argument("--plot", action="store_true",
                   help="Plot column statistics")
    p.add_argument("--randomize", action="store_true",
                   help="Randomize cmffiles processing order")
    p.add_argument("--outdir", type=str, default=".")
    p.add_argument("--device", choices=["cpu", "default"],
                   default="cpu",
                   help="backend for the column-stats kernel "
                        "(cpu: host, the production default; "
                        "default: ambient jax backend)")
    p.add_argument("cmffiles", type=str, nargs="+", metavar="cmf_file")
    return p


def main(argv=None):
    if argv is None:  # owning the process: allow the re-exec
        from ..utils.config import ensure_alloc_cache
        ensure_alloc_cache()
    import numpy as np
    from ..utils.config import default_compile_cache
    from .profile import profile_files

    default_compile_cache()

    args = build_parser().parse_args(argv)
    if args.device == "cpu":
        # The column-stats kernels are tiny and transfer-bound: the host
        # backend beats shipping arrays through the remote-TPU tunnel,
        # and a host-only run must not hang when the tunnel is down
        # (same rationale as srcfinder-masks --device cpu). Config-API
        # pin: the JAX_PLATFORMS env var is ignored on the deployment
        # VM (CLAUDE.md).
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    files = list(args.cmffiles)
    if len(files) > 1 and args.randomize:
        files = list(np.array(files)[np.random.permutation(len(files))])
    results = profile_files(files, outdir=args.outdir,
                            use_robust_stats=args.robust, n_jobs=args.jobs)
    if args.plot:
        import os
        from .profile import plot_stats
        for f in files:
            outbase = os.path.splitext(os.path.basename(f))[0]
            colcsv = os.path.join(args.outdir, outbase + "_column_stats.csv")
            if os.path.exists(colcsv):
                plot_stats(f, colcsv, use_robust_stats=args.robust)
    if args.verbose:
        for f, r in zip(files, results):
            print(f, "->", r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
