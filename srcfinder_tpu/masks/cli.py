"""CLI: batch spectrometer mask generation
(reference: spectrometer_masks/masks_sds.py:62-107 argparse surface).

usage: srcfinder-masks --txt FLIGHTS.txt --inpath DIR --outpath DIR
       [-T THR] [-dark THR] [-C THR] [-B 150m] [-M 150m] [-A PX] [...]
"""

from __future__ import annotations

import argparse
import os
import sys

SCRIPT_VERSION = "1.0.0"


def build_parser():
    p = argparse.ArgumentParser(
        description="Flare/cloud/specular/dark masks for AVIRIS-NG "
                    f"radiance files. v{SCRIPT_VERSION}",
        add_help=False, allow_abbrev=False)
    p.add_argument("--txt", type=str, required=True,
                   help="Text file listing radiance files to batch process")
    p.add_argument("--inpath", type=str, required=True,
                   help="Path containing orthocorrected radiance files")
    p.add_argument("--outpath", type=str, required=True,
                   help="Path to write outputs to")
    p.add_argument("-T", "--saturationthreshold", type=float, default=None)
    p.add_argument("-dark", "--dark_threshold", type=float, default=0.104)
    p.add_argument("-C", "--cldthreshold", type=float, nargs=1,
                   default=[15.0])
    p.add_argument("-W", "--saturationwindow", type=float, nargs=2,
                   metavar=("LOW", "HIGH"), default=None)
    p.add_argument("-D", "--cldbands", type=float, nargs=2, default=None)
    p.add_argument("-B", "--cldbfr", type=str, default="150m")
    p.add_argument("-M", "--maskgrowradius", type=str, default="150m")
    p.add_argument("-A", "--mingrowarea", type=int, nargs="?", const=5,
                   default=None)
    p.add_argument("--saturation-processing-block-length", type=int,
                   default=500, dest="block_step")
    p.add_argument("--visible-mask-growing-threshold", type=float,
                   default=9.0, dest="vis_thr")
    p.add_argument("-o", "--overwrite", action="store_true")
    p.add_argument("--store-in", default=None,
                   help="object-store URI (s3://bucket/prefix or a local "
                        "dir) to FETCH radiance from before processing — "
                        "the AWS Batch variant's surface (reference: "
                        "deployment/spectrometer-masks/masks_sds.py:261-330)")
    p.add_argument("--store-out", default=None,
                   help="object-store URI to UPLOAD the mask products to")
    p.add_argument("--device", choices=["default", "cpu"], default="default",
                   help="run the (elementwise, transfer-bound) mask kernel "
                        "on the host CPU backend instead of the accelerator")
    p.add_argument("-h", "--help", action="help")
    return p


def mask_output_name(f_txt: str) -> str:
    """xxxYYYYMMDDtHHMMSS_rdn_v2x1_img -> xxxYYYYMMDDtHHMMSS_msk_v2x1_img
    (reference: masks_sds.py:380-389)."""
    parts = f_txt.split("_")
    if len(parts) >= 3 and parts[1] == "rdn":
        return "_".join([parts[0], "msk"] + parts[2:])
    return f_txt + "_msk"


def flightline_mask_config(rdn, rdn_path="", *, saturationthreshold=None,
                           saturationwindow=None, cld_threshold=15.0,
                           cldbands=None, dark_threshold=0.104,
                           cldbfr="150m", maskgrowradius="150m",
                           vis_thr=9.0):
    """Resolve the per-flightline MaskParams + pixel radii from the ENVI
    header (band indices from the wavelength list; the reference
    hardcodes AVIRIS-NG band numbers, masks_sds.py:49-59). Shared by the
    standalone CLI and the fused single-pass pipeline stage."""
    import numpy as np
    from .sds import MaskParams, get_radius_in_pixels

    centers = rdn.bands.centers
    if not centers:           # None or [] when the header has no list
        raise ValueError(f"no wavelength metadata in {rdn_path}; the "
                         "spectrometer masks need band centers")
    wavelengths = np.array(centers, dtype=np.float64)
    nearest = lambda nm: int(np.argmin(np.abs(wavelengths - nm)))
    cld = (tuple(nearest(nm) for nm in (450., 670., 1250.))
           if cldbands is None else
           (nearest(cldbands[0]), nearest(670.), nearest(cldbands[1])))
    params = MaskParams(
        saturation_threshold=(saturationthreshold
                              if saturationthreshold is not None else 6.0),
        saturation_window=(tuple(saturationwindow) if saturationwindow
                           else (1945., 2485.)),
        cld_threshold=cld_threshold,
        cld_bands=cld,
        dark_band=nearest(2139.),
        spec_band=nearest(505.),
        dark_threshold=dark_threshold,
        vis_grow_threshold=vis_thr)
    grow_px = (get_radius_in_pixels(maskgrowradius, rdn.metadata)
               if maskgrowradius else None)
    cld_px = get_radius_in_pixels(cldbfr, rdn.metadata) if cldbfr else 0.0
    return params, grow_px, cld_px, wavelengths


def masks_for_flightline(rdn_path: str, outpath: str, *,
                         saturationthreshold=None, saturationwindow=None,
                         cld_threshold=15.0, cldbands=None,
                         dark_threshold=0.104, cldbfr="150m",
                         maskgrowradius="150m", mingrowarea=5,
                         block_step=500, vis_thr=9.0, device=None,
                         overwrite=True, out_name=None, tap=None,
                         tap_bands=None):
    """Generate the 4-band QC mask for one radiance flightline (the masks
    CLI's per-scene core, reusable by the one-command pipeline). Returns
    the output image basename. Band indices are resolved from the
    header's wavelength list (reference hardcodes the AVIRIS-NG band
    numbers, masks_sds.py:49-59).

    ``tap(r0, r1, block, pos)``: optional observer of every streamed
    line block — lets the fused pipeline capture the CMF's active-band
    slab during THIS read so the radiance cube is touched once
    end-to-end. ``block`` is (rows, cols, len(req)) float32 holding the
    union of the masks' needed bands, band 0 (nodata), and
    ``tap_bands``; ``pos`` maps absolute band index -> position in
    ``block``'s last axis. Only those bands' byte runs are read from
    disk (core.directio)."""
    import numpy as np
    from ..core import envi as envi_io
    from .sds import MaskParams, masks_for_cube, get_radius_in_pixels

    rdn = envi_io.open_envi(rdn_path)
    params, grow_px, cld_px, wavelengths = flightline_mask_config(
        rdn, rdn_path, saturationthreshold=saturationthreshold,
        saturationwindow=saturationwindow, cld_threshold=cld_threshold,
        cldbands=cldbands, dark_threshold=dark_threshold, cldbfr=cldbfr,
        maskgrowradius=maskgrowradius, vis_thr=vis_thr)
    # nodata collected during the streaming read (no separate full-band
    # pre-read of the cube); overlap re-reads just rewrite the same rows.
    # Only the union of needed/tap/nodata bands' byte runs are read, via
    # core.directio (O_DIRECT: 640 MB/s cold on the deployment VM vs
    # 13 MB/s through the page cache — SCALING.md "Host I/O"); falls
    # back to memmap reads when direct IO is unavailable.
    nod = np.zeros((rdn.nrows, rdn.ncols), bool)
    state = {}

    def read_block_bands(r0, r1, bands):
        if "req" not in state:
            state["req"] = sorted(set(int(b) for b in bands) | {0}
                                  | set(int(b) for b in (tap_bands or [])))
            state["pos"] = {b: i for i, b in enumerate(state["req"])}
            state["sel"] = [state["pos"][int(b)] for b in bands]
        pos = state["pos"]
        blk = np.asarray(rdn.read_lines_bands(r0, r1, state["req"]),
                         np.float32)
        if tap is not None:
            tap(r0, r1, blk, pos)
        nod[r0:r1] = blk[:, :, pos[0]] == -9999
        return blk[:, :, state["sel"]]

    out = masks_for_cube(
        read_block_bands=read_block_bands,
        nrows=rdn.nrows, ncols=rdn.ncols, wavelengths=wavelengths,
        params=params, maskgrowradius_px=grow_px,
        mingrowarea=mingrowarea, cldbfr_px=cld_px,
        block_step=block_step,
        nodata_row0=lambda: nod, device=device)

    meta = {
        "description": "Flare and cloud mask (srcfinder_tpu).",
        "band names": ["Cloud mask (dimensionless)",
                       "Specular mask (dimensionless)",
                       "Flare mask (dimensionless)",
                       "Dark mask (dimensionless)"],
        "data ignore value": -9999,
    }
    if "map info" in rdn.metadata:
        meta["map info"] = rdn.metadata["map info"]
    stem = os.path.splitext(os.path.basename(rdn_path))[0]
    if stem.endswith(".hdr"):
        stem = os.path.splitext(stem)[0]
    outname = out_name or mask_output_name(stem)
    envi_io.save_envi(os.path.join(outpath, outname + ".hdr"), out,
                      metadata=meta, interleave="bil", force=overwrite)
    return outname


def main(argv=None):
    if argv is None:  # owning the process: allow the re-exec
        from ..utils.config import ensure_alloc_cache
        ensure_alloc_cache()
    from ..utils.config import default_compile_cache
    default_compile_cache()

    args = build_parser().parse_args(argv)
    print("Arguments:")
    print(args)

    with open(args.txt) as fd:
        files = fd.read().splitlines()

    store_in = store_out = None
    if args.store_in:
        from ..flow.objectstore import open_store
        store_in, _ = open_store(args.store_in)
    if args.store_out:
        from ..flow.objectstore import open_store
        store_out, _ = open_store(args.store_out)

    for f_txt in files:
        if not f_txt.strip():
            continue
        print("Processing flight", f_txt)
        if store_in is not None:
            os.makedirs(args.inpath, exist_ok=True)
            for ext in (".hdr", ""):
                if store_in.exists(f_txt + ext):
                    store_in.get(f_txt + ext,
                                 os.path.join(args.inpath, f_txt + ext))
        # band indices resolved from wavelengths: on real AVIRIS-NG these
        # land on the reference's hardcoded bands (cloud 15/60/175 =
        # 450/670/1250 nm, dark 352 = 2139 nm, specular 25 = ~505 nm)
        dev = None
        if args.device == "cpu":
            import jax
            # A host-only run must not require the accelerator tunnel to
            # be alive: without the pin, jax.devices("cpu") first
            # initializes the default (remote TPU) backend, which hangs
            # indefinitely when the tunnel is down (observed 2026-08-18).
            # The JAX_PLATFORMS env var is ignored on the deployment VM;
            # only the config API pin works (CLAUDE.md). No-op if a
            # backend is already up (ImportError-free best effort).
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
            dev = jax.devices("cpu")[0]
        # idempotent resume (the reference pipelines' skip convention):
        # existing products are regenerated only with --overwrite, but
        # the store-out upload below still runs either way (a resumed
        # Batch job must still deliver the product to the bucket)
        outname = mask_output_name(f_txt)
        if not args.overwrite and os.path.exists(
                os.path.join(args.outpath, outname)):
            print("Skipping existing " + outname)
        else:
            outname = masks_for_flightline(
                os.path.join(args.inpath, f_txt + ".hdr"), args.outpath,
                saturationthreshold=args.saturationthreshold,
                saturationwindow=args.saturationwindow,
                cld_threshold=args.cldthreshold[0], cldbands=args.cldbands,
                dark_threshold=args.dark_threshold, cldbfr=args.cldbfr,
                maskgrowradius=args.maskgrowradius,
                mingrowarea=args.mingrowarea, block_step=args.block_step,
                vis_thr=args.vis_thr, device=dev,
                out_name=outname)
            print("Generated " + outname)
        if store_out is not None:
            for ext in (".hdr", ""):
                src = os.path.join(args.outpath, outname + ext)
                if os.path.isfile(src):
                    store_out.put(src, outname + ext)
    print("Completed all scenes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
