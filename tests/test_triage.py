"""Triage tests: column stats vs numpy, systematics detector behavior, and
a synthetic version of the COVID oracle end to end."""

import os

import numpy as np
import pytest

from srcfinder_tpu.triage import (column_stats, summarize_cmf,
                                  systematics_count, flag_systematics,
                                  profile_files, load_systematics_list,
                                  validate_systematics)


def test_column_stats_standard(rng):
    cmf = rng.normal(loc=100, scale=30, size=(50, 12)).astype(np.float32)
    mask = cmf > 0
    import jax.numpy as jnp
    npix, avg, std, mn, mx = (np.asarray(s) for s in
                              column_stats(jnp.asarray(cmf),
                                           jnp.asarray(mask)))
    for c in range(12):
        vals = cmf[:, c][mask[:, c]]
        assert npix[c] == len(vals)
        np.testing.assert_allclose(avg[c], vals.mean(), rtol=1e-5)
        np.testing.assert_allclose(std[c], vals.std(), rtol=1e-4)
        np.testing.assert_allclose(mn[c], vals.min(), rtol=1e-6)
        np.testing.assert_allclose(mx[c], vals.max(), rtol=1e-6)


def test_column_stats_robust(rng):
    cmf = rng.normal(loc=100, scale=30, size=(60, 5)).astype(np.float32)
    mask = np.ones_like(cmf, bool)
    import jax.numpy as jnp
    npix, med, madv, p05, p95 = (np.asarray(s) for s in
                                 column_stats(jnp.asarray(cmf),
                                              jnp.asarray(mask),
                                              robust=True))
    for c in range(5):
        vals = cmf[:, c].astype(np.float64)
        np.testing.assert_allclose(med[c], np.median(vals), rtol=1e-5)
        np.testing.assert_allclose(
            madv[c], np.median(np.abs(vals - np.median(vals))), rtol=1e-4)


def test_systematics_detector():
    rng = np.random.default_rng(0)
    # clean profile: smooth, no isolated column spikes
    med = 100 + np.sin(np.linspace(0, 3, 598)) * 5 + rng.normal(0, 0.5, 598)
    assert flag_systematics(med) == 0
    # inject a strong single-column systematic
    bad = med.copy()
    bad[300] += 60
    assert systematics_count(bad) >= 1
    assert flag_systematics(bad) == 1


def test_summarize_and_validate(tmp_path, rng):
    """Synthetic mini COVID oracle: 6 flightlines, 2 with systematics."""
    from srcfinder_tpu.core import envi as envi_io

    stats_dir = tmp_path / "stats"
    os.makedirs(stats_dir)
    names, sev = [], []
    for i in range(6):
        name = f"ang2020010{i}t000000_cmf_v1x"
        has_sys = i in (2, 5)
        cmf = rng.normal(loc=300, scale=20, size=(80, 40)).astype(np.float32)
        if has_sys:
            cmf[:, 20] += 500.0
        img = np.zeros((80, 40, 4), np.float32)
        img[..., :3] = 5.0
        img[..., 3] = np.abs(cmf)
        envi_io.save_envi(str(tmp_path / (name + ".hdr")), img,
                          metadata={"data ignore value": -9999},
                          interleave="bip")
        names.append(name)
        sev.append(2.0 if has_sys else 0.0)

    files = [str(tmp_path / n) for n in names]
    out = profile_files(files, outdir=str(stats_dir), use_robust_stats=True,
                        n_jobs=2)
    assert all(out)
    # idempotent skip (reference: cmf_profile.py:101-103)
    again = profile_files(files[:1], outdir=str(stats_dir),
                          use_robust_stats=True)
    assert again == [False]

    listf = tmp_path / "COVID_systematics.txt"
    listf.write_text("".join(f"{n} {s}\n" for n, s in zip(names, sev)))
    nm, sv = load_systematics_list(str(listf))
    rep = validate_systematics(nm, sv, str(stats_dir))
    assert rep["strict"]["none_tp"] == 4
    assert rep["strict"]["any_tp"] == 2
    assert rep["strong_tp"] == 2
    assert rep["strict"]["none_fp"] == 0


def test_missing_csv_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        validate_systematics(["nope"], np.array([0.0]), str(tmp_path))


def test_plot_stats(tmp_path, rng):
    from srcfinder_tpu.core import envi as envi_io
    from srcfinder_tpu.triage import summarize_cmf, plot_stats
    name = "ang20200101t000000_cmf_v1x"
    img = np.zeros((50, 30, 4), np.float32)
    img[..., :3] = 5.0
    img[..., 3] = np.abs(rng.normal(300, 40, size=(50, 30)))
    envi_io.save_envi(str(tmp_path / (name + ".hdr")), img,
                      metadata={"data ignore value": -9999},
                      interleave="bip")
    csvf = summarize_cmf(str(tmp_path / name), str(tmp_path),
                         use_robust_stats=True)
    pdf1, pdf2 = plot_stats(str(tmp_path / name), csvf,
                            use_robust_stats=True, ncols_fpa=30)
    assert os.path.getsize(pdf1) > 1000
    assert os.path.getsize(pdf2) > 1000
