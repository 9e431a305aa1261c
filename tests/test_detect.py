"""Detection pipeline tests: shift-and-stitch parity vs a literal loop
oracle, dense CNN window extraction, salience->candidates, filtdet, and
posthoc downsampling."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcfinder_tpu.models import googlenet
from srcfinder_tpu.detect import (stitch_stack, fcn_shift_saliency,
                                  salience2detections, save_detections,
                                  filtdet, kde, gaussian_downsample,
                                  preprocess_ch4, norm_for_model)
from srcfinder_tpu.models.fcn import fcn_apply


@pytest.fixture(scope="module")
def small_model():
    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1)), train=False)
    return model, variables


def test_stitch_stack_matches_literal_loop(rng):
    """stitch as flip+transpose+reshape == the reference's per-shift
    strided assignment (fcn_pred_pipeline.py:73-95)."""
    scale, h, w = 4, 3, 5
    fl_shape = (9, 17)
    preds = rng.normal(size=(scale * scale, h, w)).astype(np.float32)

    stitched_ref = np.zeros((h * scale, w * scale))
    for i in range(scale * scale):
        top, left = i // scale, i % scale
        stitched_ref[scale - top - 1::scale, scale - left - 1::scale] = preds[i]
    stitched_ref = stitched_ref[scale // 2: fl_shape[0] + scale // 2,
                                scale // 2: fl_shape[1] + scale // 2]

    got = np.asarray(stitch_stack(fl_shape, jnp.asarray(preds), scale))
    np.testing.assert_array_equal(got, stitched_ref)


def test_fcn_shift_views_match_reference_padding(small_model, rng):
    """Each dynamic-slice view equals the reference's explicit
    ZeroPad2d((left, s-left, top, s-top)) padding
    (fcn_pred_pipeline.py:56-71)."""
    from srcfinder_tpu.detect.fcn_pipeline import divisibility_pad
    scale = 8
    img = rng.normal(size=(11, 14)).astype(np.float32)
    padded = np.asarray(divisibility_pad(jnp.asarray(img), scale))
    canvas = np.pad(padded, ((scale, scale), (scale, scale)))
    hp, wp = padded.shape[0] + scale, padded.shape[1] + scale
    for top, left in [(0, 0), (3, 5), (7, 7)]:
        ref = np.pad(padded, ((top, scale - top), (left, scale - left)))
        view = canvas[scale - top: scale - top + hp,
                      scale - left: scale - left + wp]
        np.testing.assert_array_equal(view, ref)


def test_fcn_chunk_matches_explicit_padding_forwards(small_model, rng):
    """A batched shift chunk == explicit per-shift ZeroPad2d forwards.

    Combined with test_stitch_stack_matches_literal_loop and
    test_fcn_shift_views_match_reference_padding this covers the full
    shift-and-stitch path without the 1024-forward oracle loop."""
    from srcfinder_tpu.detect.fcn_pipeline import (_fcn_shifts_chunk,
                                                   divisibility_pad)
    model, variables = small_model
    scale = 32
    img = rng.normal(size=(20, 45)).astype(np.float32)
    padded = divisibility_pad(jnp.asarray(img), scale)
    canvas = jnp.pad(padded, ((scale, scale), (scale, scale)))
    shifts = [(0, 0), (5, 17), (31, 31), (17, 0)]
    tops = jnp.asarray([t for t, _ in shifts])
    lefts = jnp.asarray([l for _, l in shifts])
    got = np.asarray(_fcn_shifts_chunk(model, variables, canvas, tops,
                                       lefts, scale, len(shifts)))
    pnp = np.asarray(padded)
    for i, (top, left) in enumerate(shifts):
        t = np.pad(pnp, ((top, scale - top), (left, scale - left)))
        logits = fcn_apply(model, variables, jnp.asarray(t)[None, ..., None])
        ref = np.asarray(jax.nn.softmax(logits, -1))[0, ..., 1]
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-6)


def test_fcn_full_pipeline_smoke(small_model, rng):
    model, variables = small_model
    img = rng.normal(size=(20, 45)).astype(np.float32)
    got = np.asarray(fcn_shift_saliency(model, variables, jnp.asarray(img),
                                        scale=32, batch=256))
    assert got.shape == (20, 45)
    assert np.isfinite(got).all()
    assert ((got >= 0) & (got <= 1)).all()


def test_cnn_window_chunk_matches_crops(small_model, rng):
    """Window gather + batched forward == per-crop forwards
    (reference FlightlineConvolve semantics, cnn_pred_pipeline.py:32-58)."""
    from srcfinder_tpu.detect.cnn_pipeline import (reference_pad,
                                                   cnn_window_saliency)
    model, variables = small_model
    dim = 32
    img = rng.normal(size=(5, 7)).astype(np.float32)
    sal = np.asarray(cnn_window_saliency(model, variables, jnp.asarray(img),
                                         dim=dim, batch=16))
    padded = np.asarray(reference_pad(jnp.asarray(img), dim))
    assert padded.shape == (5 + dim - 1, 7 + dim - 1)
    for (r, c) in [(0, 0), (2, 3), (4, 6)]:
        win = padded[r:r + dim, c:c + dim]
        logits = model.apply(variables, jnp.asarray(win)[None, ..., None],
                             train=False)
        ref = np.asarray(jax.nn.softmax(logits, -1))[0, 1]
        np.testing.assert_allclose(sal[r, c], ref, rtol=1e-5, atol=1e-6)


def test_cnn_window_scan_matches_per_batch(small_model, rng):
    """The fori_loop scan (one dispatch per `superbatch` batches — the
    dispatch-amortized path, VERDICT r2 item 3) is bit-identical to the
    per-batch host loop, including the padded tail and multi-dispatch
    splits."""
    from srcfinder_tpu.detect.cnn_pipeline import cnn_window_saliency
    model, variables = small_model
    img = rng.normal(size=(9, 13)).astype(np.float32)   # 117 windows
    per_batch = np.asarray(cnn_window_saliency(
        model, variables, jnp.asarray(img), dim=32, batch=16, superbatch=1))
    # stride 16*4=64 -> 2 dispatches, second with a padded tail
    scanned = np.asarray(cnn_window_saliency(
        model, variables, jnp.asarray(img), dim=32, batch=16, superbatch=4))
    np.testing.assert_array_equal(scanned, per_batch)


def test_cnn_fast_mode_runs(small_model, rng):
    from srcfinder_tpu.detect.cnn_pipeline import cnn_fast_saliency
    model, variables = small_model
    img = rng.normal(size=(6, 9)).astype(np.float32)
    sal = np.asarray(cnn_fast_saliency(model, variables, jnp.asarray(img),
                                       dim=64))
    assert sal.shape == (6, 9)
    assert np.isfinite(sal).all()
    assert ((sal >= 0) & (sal <= 1)).all()


def test_salience2detections(rng, tmp_path):
    h, w = 40, 60
    sal = np.zeros((h, w), np.float32)
    cmf = np.zeros((h, w, 4), np.float32)
    cmf[..., :3] = 5.0
    # blob 1
    sal[10:14, 10:14] = 0.9
    cmf[11:13, 11:13, 3] = 800.0
    # blob 2
    sal[30:33, 40:44] = 0.7
    cmf[31, 41, 3] = 1200.0
    # nodata margin
    cmf[:2, :, 0] = -9999

    cmfmap = dict(proj="UTM", ulx=391000.0, uly=3786000.0, xps=3.0, yps=3.0,
                  zone="11", hemi="North", rotation=0.0)
    df = salience2detections(sal, cmf, 0.5, 250.0, "ang20200924t211102",
                             cmfmap, str(tmp_path))
    assert len(df) == 2
    assert df.iloc[0]["detid"] == "ang20200924t211102-1"
    assert df.iloc[0]["cmfmax"] == 800.0
    assert df.iloc[1]["cmfmax"] == 1200.0
    # georeferencing: lat/lon of the cmf max in a plausible range
    assert 34.1 < df.iloc[0]["cmfmaxlat"] < 34.3
    assert -119 < df.iloc[0]["cmfmaxlon"] < -117

    csvf = save_detections(str(tmp_path / "out.xlsx"), df)
    import pandas as pd
    back = pd.read_csv(csvf)
    assert "Candidate ID" in back.columns
    assert len(back) == 2
    # the xlsx (the reference's canonical trigger artifact,
    # salience_predictions.py:187-192) is written unconditionally and
    # round-trips through the stdlib reader
    from srcfinder_tpu.core.xlsx import read_xlsx
    xl = read_xlsx(str(tmp_path / "out.xlsx"), "Plume_List")
    assert list(xl.columns) == list(back.columns)
    assert xl["CMF Max (ppmm)"].tolist() == back["CMF Max (ppmm)"].tolist()


def test_filtdet(rng):
    h, w = 80, 80
    ch4 = np.zeros((h, w), np.float32)
    # strong 5x5 plume (25 px >= minarea), the KDE density peak
    ch4[20:25, 20:25] = 800.0
    # weak isolated single pixel: KDE-weighted value falls below mfmin
    ch4[60, 60] = 600.0
    # very strong small (2x2) component: passes the KDE threshold, gets
    # dropped as small (4 < minarea), then re-added since >= mfminsmall
    ch4[70:72, 10:12] = 3000.0
    nodata = np.zeros((h, w), bool)
    detkde, detcomp = filtdet(ch4, nodata, minarea=9, mfmin=500, mfmax=1500,
                              k=5, mfminsmall=1250)
    assert detcomp[22, 22] > 0
    assert detcomp[60, 60] == 0
    assert detcomp[70, 10] > 0
    assert detkde.min() >= 0 and detkde.max() <= 1
    # labels sequential
    labs = np.unique(detcomp)
    assert labs[-1] == len(labs) - 1


def test_kde_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter
    img = rng.normal(size=(30, 40)).astype(np.float32) ** 2
    got = np.asarray(kde(img, k=5))
    sm = gaussian_filter(img, sigma=5, truncate=1)
    smn = (sm - sm.min()) / (sm.max() - sm.min())
    ref = img * smn
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_gaussian_downsample(rng):
    img = np.abs(rng.normal(size=(60, 90))).astype(np.float32) * 100
    img[:5, :5] = -9999.0
    out = np.asarray(gaussian_downsample(img, src_res=5.0, dst_res=30.0))
    assert out.shape == (10, 15)
    assert (out[0, 0] == -9999.0)
    # away from nodata, blur preserves the local mean roughly
    assert abs(np.mean(out[3:, 3:]) - np.mean(img[20:, 20:])) < 20


def test_preprocess():
    x = jnp.asarray([-10.0, 0.0, 4000.0, 9000.0])
    mean, std = norm_for_model("COVID_QC")
    got = np.asarray(preprocess_ch4(x, mean, std))
    np.testing.assert_allclose(got[0], got[1])      # clamped below
    np.testing.assert_allclose(got[2], got[3])      # clamped above
    np.testing.assert_allclose(got[1], (0 - mean) / std, rtol=1e-6)
    assert norm_for_model("multi_64") == (115.0, 190.0)
    with pytest.raises(KeyError):
        norm_for_model("nope")


def test_fcn_phase_saliency_bitexact(small_model, rng):
    """The phase-deduplicated fast path must be bit-exact vs the per-shift
    path (zero background is a fixed point for freshly-initialized BN)."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    model, variables = small_model
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_shift_saliency(model, variables,
                                        jnp.asarray(img), 32, 256))
    got = np.asarray(fcn_phase_saliency(model, variables, jnp.asarray(img)))
    np.testing.assert_array_equal(got, ref)


def test_fcn_phase_batch_matches_single(small_model, rng):
    """Campaign mode: N scenes through one executable must equal the
    single-scene phase path per scene (VERDICT r2 item 4)."""
    from srcfinder_tpu.detect.fcn_pipeline import (fcn_phase_saliency,
                                                   fcn_phase_saliency_batch)
    model, variables = small_model
    imgs = rng.normal(size=(3, 20, 45)).astype(np.float32)
    got = np.asarray(fcn_phase_saliency_batch(model, variables,
                                              jnp.asarray(imgs)))
    assert got.shape == (3, 20, 45)
    for i in range(3):
        ref = np.asarray(fcn_phase_saliency(model, variables,
                                            jnp.asarray(imgs[i])))
        np.testing.assert_array_equal(got[i], ref)


def test_fcn_cli_campaign_mode(tmp_path, rng):
    """srcfinder-fcn-pred with MULTIPLE flightlines: scenes batched
    through one executable; per-scene outputs match the single-scene CLI
    (same-shaped scenes are bit-identical through the batch path)."""
    import jax
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.detect import fcn_cli
    from srcfinder_tpu.detect.cnn_cli import save_weights
    from srcfinder_tpu.models import googlenet

    m = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    wf = str(tmp_path / "w.npz")
    save_weights(wf, m.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 1)), train=False))
    meta = {"data ignore value": -9999}
    paths = []
    for i in range(2):
        band = np.abs(rng.normal(size=(20, 45))).astype(np.float32) * 300
        band[0, i] = -9999.0
        pth = str(tmp_path / f"ang2020010{i}t000000_cmf_v2y1_img")
        envi_io.save_envi(pth + ".hdr", band[..., None], metadata=meta,
                          interleave="bip")
        paths.append(pth)

    out_c = str(tmp_path / "campaign")
    rc = fcn_cli.main(paths + ["-m", "multi_64", "-w", wf, "-o", out_c])
    assert rc == 0
    out_s = str(tmp_path / "single")
    rc = fcn_cli.main([paths[0], "-m", "multi_64", "-w", wf, "-o", out_s,
                       "--method", "phase"])
    assert rc == 0
    name = os.path.basename(paths[0]) + "_saliency"
    got = np.asarray(envi_io.open_envi(os.path.join(out_c, name)).load())
    ref = np.asarray(envi_io.open_envi(os.path.join(out_s, name)).load())
    np.testing.assert_array_equal(got, ref)
    # second scene's product exists and is nodata-stamped
    name2 = os.path.basename(paths[1]) + "_saliency"
    sal2 = np.asarray(envi_io.open_envi(
        os.path.join(out_c, name2)).load()).squeeze()
    assert sal2[0, 1] == -9999.0
    assert ((sal2[sal2 != -9999] >= 0) & (sal2[sal2 != -9999] <= 1)).all()


def test_fcn_cli_campaign_hbm_guard(tmp_path, rng, monkeypatch):
    """A campaign group over the HBM pixel budget runs scenes singly
    (halo-blocked when one scene alone exceeds it); products still
    match the single-scene CLI."""
    import jax
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.detect import fcn_cli
    from srcfinder_tpu.detect.cnn_cli import save_weights
    from srcfinder_tpu.models import googlenet

    m = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    wf = str(tmp_path / "w.npz")
    save_weights(wf, m.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 1)), train=False))
    meta = {"data ignore value": -9999}
    paths = []
    for i in range(2):
        band = np.abs(rng.normal(size=(20, 45))).astype(np.float32) * 300
        pth = str(tmp_path / f"ang2021010{i}t000000_cmf_v2y1_img")
        envi_io.save_envi(pth + ".hdr", band[..., None], metadata=meta,
                          interleave="bip")
        paths.append(pth)

    monkeypatch.setenv("SRCFINDER_FCN_MAX_PX", "500")  # force the guard
    out_g = str(tmp_path / "guarded")
    rc = fcn_cli.main(paths + ["-m", "multi_64", "-w", wf, "-o", out_g])
    assert rc == 0
    monkeypatch.delenv("SRCFINDER_FCN_MAX_PX")
    out_s = str(tmp_path / "single")
    rc = fcn_cli.main([paths[0], "-m", "multi_64", "-w", wf, "-o", out_s,
                       "--method", "phase"])
    assert rc == 0
    name = os.path.basename(paths[0]) + "_saliency"
    got = np.asarray(envi_io.open_envi(os.path.join(out_g, name)).load())
    ref = np.asarray(envi_io.open_envi(os.path.join(out_s, name)).load())
    np.testing.assert_array_equal(got, ref)


def test_downsample_cli(tmp_path, rng):
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.detect import downsample_cli
    data = np.abs(rng.normal(size=(60, 90))).astype(np.float32) * 100
    meta = {"data ignore value": -9999,
            "map info": ["UTM", "1", "1", "391000", "3786000", "5.0",
                         "5.0", "11", "North", "WGS-84", "units=Meters",
                         "rotation=0"]}
    src = str(tmp_path / "src")
    envi_io.save_envi(src + ".hdr", data, metadata=meta, interleave="bip")
    dst = str(tmp_path / "dst")
    rc = downsample_cli.main([src, dst, "-r", "30"])
    assert rc == 0
    out = envi_io.open_envi(dst)
    assert out.shape[:2] == (10, 15)
    from srcfinder_tpu.core.geo import mapinfo
    assert mapinfo(out)["xps"] == 30.0


def test_sharded_fcn_matches_single_device(small_model, rng):
    """FCN shifts sharded over the 8-device CPU mesh == single device."""
    from srcfinder_tpu.parallel import make_mesh, shard_fcn_shifts
    model, variables = small_model
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_shift_saliency(model, variables, jnp.asarray(img),
                                        scale=32, batch=256))
    mesh = make_mesh(8, axis_names=("data",))
    got = np.asarray(shard_fcn_shifts(mesh, model, variables,
                                      jnp.asarray(img), batch=256))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _trained_like(variables, seed=3):
    """Trained-like weights for parity bounds: fresh init gives ~1e-13
    logits (softmax == 0.5 exactly in any dtype), so meaningful deltas
    need nonzero BN running stats and affine params."""
    r = np.random.default_rng(seed)
    vs = jax.tree_util.tree_map(np.asarray, variables)  # fresh containers

    def walk(d):
        for v in d.values():
            if isinstance(v, dict):
                walk(v)
        if "mean" in d and "var" in d:
            d["mean"] = r.normal(scale=0.5,
                                 size=d["mean"].shape).astype(np.float32)
            d["var"] = np.abs(r.normal(1.0, 0.3,
                                       size=d["var"].shape)).astype(np.float32)
        if "bias" in d and "scale" in d:
            d["bias"] = r.normal(scale=0.3,
                                 size=d["bias"].shape).astype(np.float32)
            d["scale"] = np.abs(r.normal(1.0, 0.2,
                                         size=d["scale"].shape)).astype(np.float32)

    walk(vs["batch_stats"])
    walk(vs["params"])
    return jax.tree_util.tree_map(jnp.asarray, vs)


def test_fcn_phase_trained_bn_deviation_bounded(small_model, rng):
    """With trained (nonzero) BN stats the phase-dedup path is no longer
    bit-exact near flightline edges (the background fill constants are
    the steady-state field, not the edge-transient one) — quantify it:
    the deviation vs the literal per-shift path stays below 1e-3 on
    probabilities (measured 5.8e-5 on this configuration)."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    model, variables = small_model
    vt = _trained_like(variables)
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_shift_saliency(model, vt, jnp.asarray(img),
                                        32, 256))
    got = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img)))
    assert np.abs(ref - got).max() < 1e-3


def test_fcn_phase_wide_layout_matches_scan(small_model, rng):
    """The wide-batch phase layout (four full-width batch applies per
    stage, phase-major order + digit-reversed stitch permutation) is
    bit-identical to the scan layout — same stage applies, same fills,
    only the scheduling and index bookkeeping differ. Trained-like BN
    so the fill constants are nonzero (the hard case for the
    permutation: every phase map differs)."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    model, variables = small_model
    vt = _trained_like(variables)
    img = rng.normal(size=(52, 45)).astype(np.float32)
    ref = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img)))
    got = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img),
                                        layout="wide"))
    np.testing.assert_array_equal(got, ref)


def test_fcn_phase_blocked_matches_unblocked(small_model, rng):
    """Long-flightline line-blocked phase path == unblocked, with
    trained-like BN (the hard case: every cut row would deviate if the
    halo under-covered the trunk's receptive field). Uses the real
    TRUNK_HALO so this also pins the receptive-field arithmetic."""
    from srcfinder_tpu.detect.fcn_pipeline import (
        TRUNK_HALO, fcn_phase_saliency, fcn_phase_saliency_blocked)
    model, variables = small_model
    vt = _trained_like(variables)
    h0 = 2 * 928                    # two 1824-line windows, halo 448
    img = rng.normal(size=(h0, 17)).astype(np.float32)
    ref = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img)))
    got = np.asarray(fcn_phase_saliency_blocked(
        model, vt, jnp.asarray(img), block=928, halo=TRUNK_HALO))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_fcn_phase_blocked_offgrid_lines(small_model, rng):
    """Line counts off the 32-line phase grid exercise the pre-pad
    branch: rows above the bottom halo still match the unblocked pass
    (trained-like BN); the bottom halo carries the documented extra-
    zero-rows edge caveat, bounded like the phase path's own."""
    from srcfinder_tpu.detect.fcn_pipeline import (
        TRUNK_HALO, fcn_phase_saliency, fcn_phase_saliency_blocked)
    model, variables = small_model
    vt = _trained_like(variables)
    h0 = 2 * 928 - 6                # pre-pads 6 rows to reach the grid
    img = rng.normal(size=(h0, 17)).astype(np.float32)
    ref = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img)))
    got = np.asarray(fcn_phase_saliency_blocked(
        model, vt, jnp.asarray(img), block=928, halo=TRUNK_HALO))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got[:-TRUNK_HALO], ref[:-TRUNK_HALO],
                               rtol=2e-5, atol=1e-6)
    # bottom halo: extra-zero-rows canvas edge, measured 3.2e-3 max on
    # this configuration; bound leaves headroom for platform variation
    assert np.abs(got[-TRUNK_HALO:] - ref[-TRUNK_HALO:]).max() < 2e-2


def test_fcn_blocked_auto_block_sizing():
    """Window sizing honors the HBM pixel budget across scene widths
    and stays on the 32-line phase grid."""
    from srcfinder_tpu.detect.fcn_pipeline import (
        TRUNK_HALO, WINDOW_BUDGET_PX, _auto_block)
    for width in (333, 669, 1024, 1500, 4096):
        block = _auto_block(width, TRUNK_HALO, 32)
        assert block % 32 == 0 and block >= 32
        if block > 32:  # not floored: window obeys the budget
            assert (block + 2 * TRUNK_HALO) * width <= WINDOW_BUDGET_PX
        # one more row-group would bust the budget
        assert (block + 32 + 2 * TRUNK_HALO) * width > WINDOW_BUDGET_PX
    assert _auto_block(669, TRUNK_HALO, 32) == 4320


def test_fcn_phase_blocked_short_scene_falls_back(small_model, rng):
    """Scenes shorter than one window route through the unblocked path
    unchanged (bit-identical, same executable)."""
    from srcfinder_tpu.detect.fcn_pipeline import (
        fcn_phase_saliency, fcn_phase_saliency_blocked)
    model, variables = small_model
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_phase_saliency(model, variables, jnp.asarray(img)))
    got = np.asarray(fcn_phase_saliency_blocked(model, variables,
                                                jnp.asarray(img)))
    np.testing.assert_array_equal(got, ref)


def test_fcn_phase_bf16_close_to_f32(small_model, rng):
    """bf16 trunk (the TPU benchmark mode, MXU-native) vs f32: saliency
    probability delta bounded (measured 1.2e-4 max on trained-like
    weights; bound leaves headroom for platform variation)."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    model, variables = small_model
    mb = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0,
                   dtype=jnp.bfloat16)
    vt = _trained_like(variables)
    img = rng.normal(size=(20, 45)).astype(np.float32)
    f32 = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img)))
    b16 = np.asarray(fcn_phase_saliency(mb, vt, jnp.asarray(img))
                     .astype(jnp.float32))
    assert np.abs(f32 - b16).max() < 2e-2
    # and bf16 actually engaged (stage outputs are bf16)
    s1 = mb.apply(vt, jnp.zeros((1, 64, 64, 1)), train=False, stage=1)
    assert s1.dtype == jnp.bfloat16


def test_sharded_phase_fcn_matches_single_device(small_model, rng):
    """Phase-dedup FCN with the phase batch sharded over the 8-device CPU
    mesh == single device (the multichip flagship path)."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    from srcfinder_tpu.parallel import make_mesh
    model, variables = small_model
    vt = _trained_like(variables)
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img)))
    mesh = make_mesh(8, axis_names=("data",))
    got = np.asarray(fcn_phase_saliency(model, vt, jnp.asarray(img),
                                        mesh=mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fcn_phase_flops_counter(small_model):
    """The MFU accounting (utils.flops) matches a hand-derived conv count
    on the first stage: conv1 is 7x7x1->64 stride 2."""
    from srcfinder_tpu.utils.flops import count_matmul_flops
    model, variables = small_model
    x = jax.ShapeDtypeStruct((1, 96, 96, 1), jnp.float32)
    got = count_matmul_flops(
        lambda a: model.apply(variables, a, train=False, stage=1), x)
    assert got == 2 * 48 * 48 * 64 * 7 * 7 * 1


def test_fcn_dilated_saliency_bitexact(small_model, rng):
    """The a-trous dense path must be bit-exact vs the per-shift path at
    fresh init (same equivalence class as the phase path)."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_dilated_saliency
    model, variables = small_model
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_shift_saliency(model, variables,
                                        jnp.asarray(img), 32, 256))
    got = np.asarray(fcn_dilated_saliency(model, variables,
                                          jnp.asarray(img)))
    np.testing.assert_array_equal(got, ref)


def test_fcn_dilated_trained_bn_deviation_bounded(small_model, rng):
    """With trained BN stats the a-trous path deviates from the literal
    per-shift path only near edges (ceil-pool -inf pads vs real
    zero-input features) — bounded like the phase path."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_dilated_saliency
    model, variables = small_model
    vt = _trained_like(variables)
    img = rng.normal(size=(20, 45)).astype(np.float32)
    ref = np.asarray(fcn_shift_saliency(model, vt, jnp.asarray(img),
                                        32, 256))
    got = np.asarray(fcn_dilated_saliency(model, vt, jnp.asarray(img)))
    assert np.abs(ref - got).max() < 2e-2


def test_cnn_fast_close_to_exact(small_model, rng):
    """Quantify the fast (amortized dense) CNN mode against exact
    per-window forwards: the only difference is per-window conv zero
    padding vs real neighbors, so probabilities stay close on
    trained-like weights (documented approximation,
    detect/cnn_pipeline.py)."""
    from srcfinder_tpu.detect.cnn_pipeline import (cnn_window_saliency,
                                                   cnn_fast_saliency)
    model, variables = small_model
    vt = _trained_like(variables)
    # image LARGER than the window so interior windows have real
    # neighbors (the regime where the modes actually differ)
    img = rng.normal(size=(40, 45)).astype(np.float32)
    exact = np.asarray(cnn_window_saliency(model, vt, jnp.asarray(img),
                                           dim=32, batch=256))
    fast = np.asarray(cnn_fast_saliency(model, vt, jnp.asarray(img),
                                        dim=32))
    assert fast.shape == exact.shape
    # measured 4.2e-3 max / 1.9e-3 mean on this configuration
    assert np.abs(fast - exact).max() < 5e-2


def test_fused_inception_matches_canonical(small_model, rng):
    """fuse_inference: the three parallel 1x1 convs of each inception
    block as ONE wide conv+BN must reproduce the canonical model
    (channelwise math is invariant under output-channel concat; only
    accumulation-order rounding may differ)."""
    from srcfinder_tpu.models.googlenet import fuse_inference
    model, variables = small_model
    mf, vf = fuse_inference(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(mf.apply(vf, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # stage-wise path (the phase-FCN driver) and dilated trunk
    xs = jnp.asarray(rng.normal(size=(1, 24, 24, 192)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mf.apply(vf, xs, train=False, stage=3)),
        np.asarray(model.apply(variables, xs, train=False, stage=3)),
        rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        mf.apply(vf, x, train=True,
                 rngs={"dropout": jax.random.PRNGKey(0)},
                 mutable=["batch_stats"])


def test_fused_phase_saliency_matches_canonical(small_model, rng):
    """The phase-dedup FCN pass with the fused trunk equals the
    canonical trunk's output to float tolerance."""
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    from srcfinder_tpu.models.googlenet import fuse_inference
    model, variables = small_model
    img = jnp.asarray(rng.normal(size=(20, 45)), jnp.float32)
    ref = np.asarray(fcn_phase_saliency(model, variables, img))
    mf, vf = fuse_inference(model, variables)
    got = np.asarray(fcn_phase_saliency(mf, vf, img))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_folded_model_matches_canonical(small_model, rng):
    """fold_inference: BatchNorm folded into the conv kernel/bias (and
    the parallel 1x1 convs widened) must reproduce the canonical model
    — the fold is algebraically exact; only float rounding differs."""
    from srcfinder_tpu.models.googlenet import fold_inference
    model, variables = small_model
    mf, vf = fold_inference(model, variables)
    assert "batch_stats" not in vf           # running stats consumed
    assert "bn" not in str(jax.tree_util.tree_structure(vf))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(mf.apply(vf, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # stage-wise path (the phase-FCN driver) and the dilated trunk
    xs = jnp.asarray(rng.normal(size=(1, 24, 24, 192)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mf.apply(vf, xs, train=False, stage=3)),
        np.asarray(model.apply(variables, xs, train=False, stage=3)),
        rtol=1e-4, atol=1e-5)
    # folded modules are inference-only
    with pytest.raises(ValueError):
        mf.apply(vf, x, train=True,
                 rngs={"dropout": jax.random.PRNGKey(0)})


def test_folded_nontrivial_stats_match(small_model, rng):
    """Folding with non-identity BN statistics (the trained regime:
    running mean/var far from 0/1, affine far from identity) still
    matches the canonical model."""
    from srcfinder_tpu.models.googlenet import fold_inference
    model, variables = small_model
    leaves, tree = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    variables = jax.tree_util.tree_unflatten(tree, [
        l + 0.3 * jax.random.normal(k, l.shape, l.dtype) if l.ndim == 1
        else l for l, k in zip(leaves, keys)])
    # variance must stay positive
    variables = jax.tree_util.tree_map(jnp.abs, variables)
    mf, vf = fold_inference(model, variables)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(mf.apply(vf, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fcn_saliency_image_folds_internally(small_model, rng):
    """fcn_saliency_image applies fold_inference itself: its output
    equals the explicit canonical phase pass."""
    from srcfinder_tpu.detect.fcn_pipeline import (fcn_saliency_image,
                                                   fcn_phase_saliency)
    from srcfinder_tpu.detect.preprocess import preprocess_ch4, \
        norm_for_model
    model, variables = small_model
    band = np.abs(rng.normal(size=(20, 45))).astype(np.float32) * 300.0
    band[0, :3] = -9999.0
    mean, std = norm_for_model("multi_64")
    x = preprocess_ch4(jnp.asarray(band), mean, std)
    ref = np.asarray(fcn_phase_saliency(model, variables, x))
    ref = np.where(band == -9999.0, -9999.0, ref)
    got = np.asarray(fcn_saliency_image(band, variables,
                                        model_name="multi_64",
                                        model=model, method="phase"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cnn_window_sharded_matches_single(small_model, rng):
    """Exact sliding-window CNN sharded over the 8-device CPU mesh ==
    single device (the DataParallel analog for the exact path,
    reference: cnn_pred_pipeline.py:113-116)."""
    from srcfinder_tpu.parallel import make_mesh
    from srcfinder_tpu.detect.cnn_pipeline import (
        cnn_window_saliency, cnn_window_saliency_sharded)
    model, variables = small_model
    img = rng.normal(size=(9, 13)).astype(np.float32)   # 117 windows
    single = np.asarray(cnn_window_saliency(
        model, variables, jnp.asarray(img), dim=32, batch=8, superbatch=4))
    mesh = make_mesh(8, axis_names=("data",))
    sharded = cnn_window_saliency_sharded(
        model, variables, jnp.asarray(img), mesh, dim=32, batch=8)
    np.testing.assert_array_equal(sharded, single)


def test_googlenet_midtrunk_resume_matches_full(small_model, rng):
    """The model's mid-trunk resume hooks (``start_stage`` +
    ``start_pooled``, models.googlenet) reconstruct the full forward
    from per-stage pieces: stage-by-stage evaluation with each
    stage's leading ceil-pool applied externally == the one-shot
    forward. These hooks are the seam external kernels plug into (used
    by the r4 Pallas bake-off — SCALING.md "Pallas verdict (r4)") and
    by stagewise probing."""
    from srcfinder_tpu.models.googlenet import fold_inference, _ceil_maxpool
    model, variables = fold_inference(*small_model)
    wins = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    full = np.asarray(model.apply(variables, wins, train=False))
    # stages 1..3 + stage 4's leading pool done externally
    x = model.apply(variables, wins, train=False, stage=1)
    x = model.apply(variables, x, train=False, stage=2)
    x = model.apply(variables, x, train=False, stage=3)
    x = _ceil_maxpool(x, 3, 2)
    got = np.asarray(model.apply(variables, x, train=False,
                                 start_stage=4, start_pooled=True))
    np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-6)
    # and the stage-5 resume point
    x4 = model.apply(variables, x, train=False, stage=4,
                     start_stage=4, start_pooled=True)
    got5 = np.asarray(model.apply(variables, x4, train=False,
                                  start_stage=5))
    np.testing.assert_allclose(got5, full, rtol=1e-5, atol=1e-6)


def test_cnn_window_scan_small_scene_band_clamp(small_model, rng):
    """A scene smaller than one window batch (W*(H-1) < batch) must
    still trace: the row-band gather clamps to the padded scene height
    (unclamped it crashed dynamic_slice — r3 review finding)."""
    from srcfinder_tpu.detect.cnn_pipeline import cnn_window_saliency
    model, variables = small_model
    img = rng.normal(size=(3, 4)).astype(np.float32)    # 12 windows
    per_batch = np.asarray(cnn_window_saliency(
        model, variables, jnp.asarray(img), dim=32, batch=32,
        superbatch=1))
    scanned = np.asarray(cnn_window_saliency(
        model, variables, jnp.asarray(img), dim=32, batch=32,
        superbatch=2))
    np.testing.assert_array_equal(scanned, per_batch)
