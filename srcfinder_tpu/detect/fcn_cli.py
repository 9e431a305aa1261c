"""CLI: FCN shift-and-stitch saliency map
(reference: cnn/fcn_pred_pipeline.py:98-147).

usage: srcfinder-fcn-pred FLIGHTLINE -m multi_64 -w weights.pt -s 32 -b 16
"""

from __future__ import annotations

import sys

from .cnn_cli import build_parser as _cnn_parser, load_weights, _run


def build_parser():
    p = _cnn_parser()
    p.description = "Generate a flightline saliency map with a FCN (TPU)."
    p.add_argument("--scale", "-s", type=int, default=32,
                   help="Downscaling factor of the model")
    # repurpose the inherited --method flag for the FCN execution paths
    for action in p._actions:
        if action.dest == "method":
            action.choices = ["auto", "shift", "phase", "dilated"]
            action.default = "auto"
            action.help = ("auto (dilated when scale==32), shift "
                           "(per-shift batches), phase, dilated")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .fcn_pipeline import fcn_saliency_image

    def fn(band, variables):
        return fcn_saliency_image(band, variables, model_name=args.model,
                                  scale=args.scale, batch=args.batch,
                                  method=args.method)

    return _run(args, fn)


if __name__ == "__main__":
    sys.exit(main())
