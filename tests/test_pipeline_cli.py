"""End-to-end srcfinder-pipeline test: synthetic radiance -> CMF -> FCN
saliency -> plume list (xlsx+csv) -> IME -> wind/emission enrichment,
plus the --watch job-queue mode and idempotent re-runs."""

import datetime as dt
import os

import numpy as np
import pytest

from srcfinder_tpu.core import envi as envi_io


@pytest.fixture
def flightline(tmp_path, rng):
    L, C, B = 64, 8, 425
    x = np.abs(rng.normal(4.0, 0.5, (L, C, B))).astype(np.float32) + 0.5
    absorb = np.ones(B, np.float32)
    absorb[360:410] = 0.9
    x[30:36, 3:6] *= absorb                      # plume-like absorption
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "272247.15", "3992010.65",
                         "3.1", "3.1", "11", "North", "WGS-84",
                         "units=Meters", "rotation=0"],
            "wavelength": [f"{w:.2f}" for w in
                           np.linspace(380, 2500, B)]}
    rdn = str(tmp_path / "ang20200924t211102_rdn_v2y1_img")
    envi_io.save_envi(rdn + ".hdr", x, metadata=meta, interleave="bil")
    lib = np.zeros((425, 3))
    lib[:, 0] = np.arange(1, 426)
    lib[:, 1] = np.linspace(380, 2500, 425)
    lib[:, 2] = -np.abs(rng.normal(size=425)) * 0.1
    libf = str(tmp_path / "ang_ch4_unit_3col_425chan.txt")
    np.savetxt(libf, lib)

    import jax
    import jax.numpy as jnp
    from srcfinder_tpu.models import googlenet
    from srcfinder_tpu.detect.cnn_cli import save_weights
    m = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    wf = str(tmp_path / "w.npz")
    save_weights(wf, m.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 1)), train=False))

    # winds: u=3, v=4 constant around the candidate time
    from srcfinder_tpu import flow
    lat, lon = 36.04, -119.53
    lats = np.linspace(lat - 1, lat + 1, 15)[:, None] * np.ones((1, 15))
    lons = np.linspace(lon - 1, lon + 1, 15)[None, :] * np.ones((15, 1))
    winds = tmp_path / "winds" / "hrrr" / "20200924"
    os.makedirs(winds)
    for h in (20, 21, 22):
        np.savez(str(winds / f"hrrr.20200924{h:02d}.wrfsfcf00.npz"),
                 lat=lats, lon=lons, u=np.full_like(lats, 3.0),
                 v=np.full_like(lats, 4.0), u_80=np.full_like(lats, 3.0),
                 v_80=np.full_like(lats, 4.0),
                 gust=np.full_like(lats, 6.0),
                 valid_date=f"2020-09-24T{h:02d}:00:00")
    return rdn, libf, wf, str(tmp_path / "winds")


def test_pipeline_end_to_end(flightline, tmp_path, capsys):
    from srcfinder_tpu.flow.pipeline_cli import main

    rdn, libf, wf, winds = flightline
    outdir = str(tmp_path / "out")
    rc = main([rdn, "--library", libf, "--weights", wf, "-o", outdir,
               "--prob_thr", "0.4", "--ppmm_thr", "250", "--ime", "--masks",
               "--winds", winds, "--wind-ext", ".npz",
               "--col_chunk", "8"])
    assert rc == 0
    base = "ang20200924t211102_cmf_v2y1_img"
    mskf = os.path.join(outdir, "ang20200924t211102_msk_v2y1_img")
    assert os.path.exists(mskf)
    assert envi_io.open_envi(mskf).nbands == 4
    assert os.path.exists(os.path.join(outdir, base))
    assert os.path.exists(os.path.join(outdir, base + "_saliency"))
    detdir = os.path.join(outdir, base + "_detections")
    csvs = [f for f in os.listdir(detdir) if f.endswith(".csv")]
    xlsxs = [f for f in os.listdir(detdir) if f.endswith(".xlsx")]
    assert csvs and xlsxs
    assert os.path.exists(os.path.join(outdir, base + "_ime.csv"))
    enr = os.path.join(outdir,
                       "ang20200924t211102_rdn_v2y1_img_plumes_enriched.csv")
    assert os.path.exists(enr)
    import csv as _csv
    row = list(_csv.DictReader(open(enr)))[0]
    wind_means = [float(v) for k, v in row.items()
                  if "Wind Mean" in k and v not in ("", "NA")]
    assert wind_means and all(abs(v - 5.0) < 1e-6 for v in wind_means)

    # idempotent second run: every stage skipped
    capsys.readouterr()
    rc = main([rdn, "--library", libf, "--weights", wf, "-o", outdir,
               "--prob_thr", "0.4", "--ppmm_thr", "250", "--ime", "--masks",
               "--winds", winds, "--wind-ext", ".npz",
               "--col_chunk", "8"])
    assert rc == 0
    outtext = capsys.readouterr().out
    assert outtext.count("[SKIP]") >= 5
    assert "[STAGE]" not in outtext


def test_pipeline_fused_single_pass_matches_separate(flightline, tmp_path):
    """--masks fuses the CMF and masks stages onto ONE streaming read of
    the radiance cube (VERDICT r2 item 1); products must be bit-identical
    to the separate-stage paths (CMF-only pipeline + standalone masks)."""
    from srcfinder_tpu.flow.pipeline_cli import run_flightline
    from srcfinder_tpu.masks.cli import masks_for_flightline

    rdn, libf, wf, winds = flightline
    out_f = str(tmp_path / "out_fused")
    out_s = str(tmp_path / "out_sep")
    pf = run_flightline(rdn, libf, wf, out_f, do_masks=True, col_chunk=8)
    assert pf["timers"].get("cmf+masks (fused single-pass read)") is not None
    ps = run_flightline(rdn, libf, wf, out_s, do_masks=False, col_chunk=8)

    cmf_f = np.asarray(envi_io.open_envi(pf["cmf"]).load())
    cmf_s = np.asarray(envi_io.open_envi(ps["cmf"]).load())
    np.testing.assert_array_equal(cmf_f, cmf_s)

    os.makedirs(str(tmp_path / "msk_sep"), exist_ok=True)
    masks_for_flightline(rdn, str(tmp_path / "msk_sep"))
    sep_name = os.path.basename(pf["masks"])
    msk_f = np.asarray(envi_io.open_envi(pf["masks"]).load())
    msk_s = np.asarray(envi_io.open_envi(
        os.path.join(str(tmp_path / "msk_sep"), sep_name)).load())
    np.testing.assert_array_equal(msk_f, msk_s)


def test_pipeline_fcn_bf16(flightline, tmp_path):
    """--fcn-dtype bfloat16 runs the saliency stage on the MXU-native
    trunk; output must stay close to the f32 stage (the delta bound is
    characterized in tests/test_detect.py)."""
    from srcfinder_tpu.flow.pipeline_cli import main

    rdn, libf, wf, _ = flightline
    out32 = str(tmp_path / "o32")
    outbf = str(tmp_path / "obf")
    for o, extra in ((out32, []), (outbf, ["--fcn-dtype", "bfloat16"])):
        rc = main([rdn, "--library", libf, "--weights", wf, "-o", o,
                   "--prob_thr", "0.4", "--col_chunk", "8"] + extra)
        assert rc == 0
    name = "ang20200924t211102_cmf_v2y1_img_saliency"
    s32 = np.asarray(envi_io.open_envi(os.path.join(out32, name)).load())
    sbf = np.asarray(envi_io.open_envi(os.path.join(outbf, name)).load())
    valid = s32 != -9999
    assert np.abs(s32[valid] - sbf[valid]).max() < 2e-2


def test_pipeline_watch_once(flightline, tmp_path):
    from srcfinder_tpu.flow.pipeline_cli import main

    rdn, libf, wf, _ = flightline
    outdir = str(tmp_path / "wout")
    watchdir = os.path.dirname(rdn)
    rc = main(["--watch", watchdir, "--once", "--library", libf,
               "--weights", wf, "-o", outdir, "--prob_thr", "0.4",
               "--col_chunk", "8"])
    assert rc == 0
    assert os.path.exists(os.path.join(
        outdir, "ang20200924t211102_cmf_v2y1_img_saliency"))
