"""Golden regression fixtures.

The reference has no test suite to inherit (SURVEY §4); its only
regression oracle is the curated COVID systematics output. These goldens
freeze THIS framework's own numerical outputs on seeded synthetic inputs
so cross-round refactors cannot silently drift: the CMF MF scores (f64,
CPU) and the FCN saliency (f32) of fixed random inputs/weights.

Regenerate intentionally with:
    python tests/test_goldens.py regen
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _cmf_case():
    from tests.test_cmf_parity import synth_radiance
    from srcfinder_tpu.cmf import matched_filter as mfmod
    rng = np.random.default_rng(12345)
    x = synth_radiance(rng, L=96, C=6, B=16)
    abscf = -np.abs(rng.normal(size=16)) * 0.1
    alphas = mfmod.default_alphas()
    with jax.enable_x64(True):
        m = mfmod.valid_mask(x)
        res = mfmod.matched_filter_columns(x.astype(np.float64), m,
                                           abscf, alphas)
    return (np.asarray(res.mf), np.asarray(res.alpha_index))


def _fcn_case():
    from srcfinder_tpu.models import googlenet
    from srcfinder_tpu.detect.fcn_pipeline import fcn_phase_saliency
    model = googlenet(num_classes=2, dropout=0.0, dropout_aux=0.0)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 64, 64, 1)), train=False)
    rng = np.random.default_rng(12345)
    img = rng.normal(size=(20, 45)).astype(np.float32)
    return (np.asarray(fcn_phase_saliency(model, variables,
                                          jnp.asarray(img))),)


_CASES = {"cmf_mf": _cmf_case, "fcn_saliency": _fcn_case}


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, name + ".npz")


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    path = _golden_path(name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (run: python "
                    "tests/test_goldens.py regen)")
    got = _CASES[name]()
    ref = np.load(path)
    assert len(ref.files) == len(got)
    for i, key in enumerate(sorted(ref.files)):
        np.testing.assert_allclose(got[i], ref[key], rtol=1e-6, atol=1e-9,
                                   err_msg=f"{name}[{key}]")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in _CASES.items():
            arrs = fn()
            np.savez(_golden_path(name),
                     **{f"a{i}": a for i, a in enumerate(arrs)})
            print("wrote", _golden_path(name))
