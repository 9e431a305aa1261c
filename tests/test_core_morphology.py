"""Morphology, stats, tiles, labels, physics tests
(reference contracts: srcfinder_util.py)."""

import numpy as np

from srcfinder_tpu.core import (morphology as morph, stats, tiles, labels,
                                physics)


def test_imlabel_conn8_vs_conn4():
    img = np.zeros((5, 5), dtype=bool)
    img[0, 0] = img[1, 1] = True  # diagonal touch
    lab8 = morph.imlabel(img)  # default CONN8
    assert lab8.max() == 1
    lab4 = morph.imlabel(img, connectivity=morph.CONN4)
    assert lab4.max() == 2


def test_findobj():
    img = np.zeros((6, 6), dtype=int)
    img[1:3, 1:3] = 1
    img[4:6, 4:6] = 2
    objs = morph.findobj(img)
    assert objs[0] == (slice(1, 3), slice(1, 3))
    assert objs[1] == (slice(4, 6), slice(4, 6))


def test_disk():
    d1 = morph.disk(1)
    assert d1.tolist() == [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    d2 = morph.disk(2)
    assert d2.shape == (5, 5)
    assert d2[0, 0] == 0 and d2[0, 2] == 1 and d2[2, 0] == 1


def test_remove_small_objects_bool_and_labeled():
    img = np.zeros((8, 8), dtype=bool)
    img[0:3, 0:3] = True      # 9 px, kept at min_size=9
    img[6, 6] = True          # 1 px, removed
    out = morph.remove_small_objects(img, min_size=9)
    assert out[0:3, 0:3].all()
    assert not out[6, 6]
    lab = morph.imlabel(img)
    out2 = morph.remove_small_objects(lab, min_size=9)
    assert out2.max() >= 1 and (out2[6, 6] == 0)


def test_relabel_sequential():
    lab = np.array([[0, 5], [5, 9]])
    out, fw, inv = morph.relabel_sequential(lab)
    assert sorted(np.unique(out).tolist()) == [0, 1, 2]
    assert out[0, 1] == 1 and out[1, 1] == 2


def test_mergelabels():
    lab = np.zeros((10, 10), dtype=int)
    lab[1, 1] = 1
    lab[1, 3] = 2   # 2 px away (chessboard) -> merged at mergedist=2
    lab[8, 8] = 3
    merged = morph.mergelabels(lab, mergedist=2)
    assert merged[1, 1] == merged[1, 3] != 0
    assert merged[8, 8] not in (0, merged[1, 1])


def test_bwdist_chessboard():
    img = np.ones((5, 5), dtype=bool)
    img[2, 2] = False
    d = morph.bwdist(img, metric="chessboard")
    assert d[2, 2] == 0
    assert d[0, 0] == 2
    assert d[2, 0] == 2


def test_region_maxima():
    img = np.zeros((6, 6))
    mask = np.zeros((6, 6), dtype=bool)
    mask[1:3, 1:3] = True
    img[2, 2] = 7.0
    mask[4:6, 4:6] = True
    img[5, 5] = 3.0
    mx, idx = morph.region_maxima(img, mask, return_index=True)
    assert sorted(mx.tolist()) == [3.0, 7.0]
    assert [2, 2] in idx.tolist() and [5, 5] in idx.tolist()


def test_mad_and_extrema():
    a = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    assert stats.mad(a) == np.median(np.abs(a - 3.0))
    assert stats.mad(a, medval=0.0) == 3.0
    vmin, vmax = stats.extrema(a)
    assert (vmin, vmax) == (1.0, 100.0)
    vmin, vmax = stats.extrema(a, p=0.8)
    assert vmax < 100.0


def test_counts():
    c = stats.counts([3, 3, 1, 2, 2, 2])
    assert list(c.items()) == [(1, 1), (3, 2), (2, 3)]


def test_extract_tile_padding():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    t = tiles.extract_tile(img, (-1, -1), 3)
    assert t.shape == (3, 3, 1)
    assert t[0, 0, 0] == 0  # padded
    assert t[1, 1, 0] == img[0, 0]
    t2 = tiles.extract_tile(img, (3, 3), 3, fill_value=-1)
    assert t2[0, 0, 0] == img[3, 3]
    assert t2[1, 1, 0] == -1


def test_pixbox():
    assert tiles.pixbox(5, 5, 2, (10, 10)) == (3, 8, 3, 8)
    assert tiles.pixbox(0, 0, 3, (10, 10)) == (0, 4, 0, 4)
    sl = tiles.pixbox(5, 5, 2, (10, 10), as_slice=True)
    assert sl == (slice(3, 8), slice(3, 8))


def test_iou():
    bb = dict(xmin=0, xmax=9, ymin=0, ymax=9, width=10, height=10)
    assert tiles.iou(bb, bb) == 1.0
    bb2 = dict(xmin=5, xmax=14, ymin=0, ymax=9, width=10, height=10)
    v = tiles.iou(bb, bb2)
    assert 0 < v < 1


def test_label_codec_roundtrip():
    lab = np.zeros((4, 4), dtype=np.uint8)
    lab[0, 0] = labels.POINTSRC
    lab[1, 1] = labels.DIFFSRC
    lab[2, 2] = labels.FALSESRC
    rgb = labels.labimg2rgb(lab)
    back = labels.rgb2labimg(rgb)
    np.testing.assert_array_equal(back, lab)
    rgba = labels.labimg2rgb(lab, rgba=True)
    assert rgba.shape == (4, 4, 4)
    assert rgba[0, 0, 3] == 255 and rgba[3, 3, 3] == 0


def test_float_rgba_roundtrip(rng):
    img = rng.uniform(size=(8, 8)).astype(np.float64)
    rgba = labels.float2rgba(img)
    back = labels.rgba2float(rgba)
    # 24-bit quantization error bound (reference asserts mean diff small,
    # srcfinder_util.py:2132-2136)
    assert np.abs(back - img).max() < 1.0 / (2 ** 24 - 1) + 1e-9


def test_ime():
    # 1e6 ppmm over one 1m pixel = 1 m^3 CH4 = 1000/22.4 mol = 0.716 kg
    val = physics.ime(np.array([1e6]), ps=1.0)
    assert abs(val - 1000.0 / 22.4 * 0.01604) < 1e-9
    # scale quadratic in pixel size
    assert physics.ime_scale(2.0) == 4 * physics.ime_scale(1.0)


def test_imresize_nn():
    img = np.arange(4, dtype=np.float32).reshape(2, 2)
    out = morph.imresize(img, (4, 4), order=0)
    assert out.shape == (4, 4)
    assert out[0, 0] == 0 and out[3, 3] == 3
