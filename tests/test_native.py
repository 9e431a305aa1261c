"""Native runtime extension tests (numpy-fallback path always tested; the
compiled path when the extension is built)."""

import numpy as np
import pytest

from srcfinder_tpu.core import native


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int16])
def test_repack_matches_numpy(rng, dtype):
    mm = (rng.normal(size=(40, 25, 33)) * 100).astype(dtype)
    out = native.bil_window_to_lcb(mm, 4, 20, 5, 30)
    ref = np.asarray(mm[:, 4:20, 5:30]).transpose(0, 2, 1).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def test_repack_strided_source(rng):
    """Works on non-contiguous sources (memmap-style views)."""
    big = rng.normal(size=(40, 50, 66)).astype(np.float64)
    view = big[:, ::2, ::2]  # strided view (25, 33)
    out = native.bil_window_to_lcb(view, 0, 10, 0, 20)
    ref = view[:, 0:10, 0:20].transpose(0, 2, 1).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def test_label8_matches_scipy(rng):
    from scipy import ndimage
    for p in (0.2, 0.5, 0.8):
        mask = rng.random((80, 70)) > p
        lab = native.label8(mask)
        ref, n = ndimage.label(mask, structure=np.ones((3, 3)))
        assert lab.max() == n
        # identical partitions (labels are a bijection)
        pairs = set(zip(lab.ravel().tolist(), ref.ravel().tolist()))
        assert len(pairs) == n + 1
        assert (lab == 0).sum() == (ref == 0).sum()


def test_label8_edge_cases():
    assert native.label8(np.zeros((5, 5), bool)).max() == 0
    ones = native.label8(np.ones((5, 5), bool))
    assert ones.max() == 1 and (ones == 1).all()
    diag = np.eye(6, dtype=bool)
    assert native.label8(diag).max() == 1  # 8-connectivity joins diagonal
