"""Data-layer tests: geometry primitives, Fourier-curve models, UCI
preprocessing (on synthetic fixture files), loaders."""

import numpy as np
import pytest

from hint_tpu.data import geometry as geo
from hint_tpu.data.fourier import LensShapeModel, PlusShapeModel
from hint_tpu.data.loaders import prepare_toy_data, prepare_uci_data
from hint_tpu.data.uci import Miniboone, Power


# ---------------------------------------------------------------- geometry


def test_circle_polygon_area():
    c = geo.circle_polygon(0, 0, 2.0, resolution=64)
    assert geo.polygon_area(c) == pytest.approx(np.pi * 4, rel=1e-3)


def test_convex_intersection_squares():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    b = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], float)
    inter = geo.convex_intersection(a, b)
    assert geo.polygon_area(inter) == pytest.approx(1.0, abs=1e-9)


def test_convex_intersection_circles_lens():
    c0 = geo.circle_polygon(0, 0, 1.0, 32)
    c1 = geo.circle_polygon(1.0, 0, 1.0, 32)
    lens = geo.convex_intersection(c0, c1)
    # analytic lens area for r=1, d=1: 2 r^2 cos^-1(d/2r) - (d/2) sqrt(4r^2-d^2)
    expected = 2 * np.arccos(0.5) - 0.5 * np.sqrt(3)
    assert geo.polygon_area(lens) == pytest.approx(expected, rel=5e-3)


def test_rect_union_outline_plus():
    xbar = ((-2, -0.5), (2, 0.5))
    ybar = ((-0.5, -2), (0.5, 2))
    ring = geo.rect_union_outline(xbar, ybar)
    # plus shape: area = 4*1 + 4*1 - 1 = 7; 12 corners
    assert geo.polygon_area(ring) == pytest.approx(7.0, abs=1e-9)
    assert len(ring) == 12


def test_rect_union_outline_contained():
    big = ((-2, -2), (2, 2))
    small = ((-1, -1), (1, 1))
    ring = geo.rect_union_outline(big, small)
    assert geo.polygon_area(ring) == pytest.approx(16.0, abs=1e-9)


def test_rect_union_outline_offset_bars():
    # bar not sticking out on one side (the degenerate case the reference's
    # shapely union handles implicitly)
    xbar = ((0.0, -0.5), (3.0, 0.5))
    ybar = ((-0.4, -2.0), (0.4, 2.0))
    ring = geo.rect_union_outline(xbar, ybar)
    ax = 3.0 * 1.0
    ay = 0.8 * 4.0
    inter = 0.4 * 1.0  # overlap x in [0,0.4], y in [-0.5,0.5]
    assert geo.polygon_area(ring) == pytest.approx(ax + ay - inter, abs=1e-6)


def test_points_in_polygon():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    pts = np.array([[0.5, 0.5], [1.5, 0.5], [-0.1, 0.2]])
    np.testing.assert_array_equal(geo.points_in_polygon(pts, sq), [True, False, False])


def test_iou_dice_identical_and_disjoint():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    iou, dice = geo.iou_and_dice(sq, sq, resolution=256)
    assert iou == pytest.approx(1.0, abs=0.02) and dice == pytest.approx(1.0, abs=0.02)
    sq2 = sq + 5.0
    iou, dice = geo.iou_and_dice(sq, sq2, resolution=256)
    assert iou == 0.0 and dice == 0.0


def test_hausdorff():
    a = np.array([[0, 0], [1, 0]], float)
    b = np.array([[0, 1], [1, 1]], float)
    mx, avg = geo.hausdorff(a, b)
    assert mx == pytest.approx(1.0) and avg == pytest.approx(1.0)


# ---------------------------------------------------------------- fourier models


def test_lens_shape_generation_and_coeffs():
    np.random.seed(0)
    m = LensShapeModel()
    x = m.sample_prior(3)
    assert x.shape == (3, 20)
    coeffs = m.unflatten_coeffs(x)
    assert coeffs.shape == (3, 2, 5)
    # flatten/unflatten round-trip
    np.testing.assert_allclose(m.flatten_coeffs(coeffs), x, atol=1e-6)
    curves = m.trace_fourier_curves(coeffs)
    assert curves.shape == (3, 100, 2) and np.isfinite(curves).all()


def test_lens_shape_joint_and_forward():
    np.random.seed(1)
    m = LensShapeModel()
    x, y = m.sample_joint(4)
    assert x.shape == (4, 20) and y.shape == (4, 2)
    y2 = m.forward_process(x, noise=0.0)
    # forward process is deterministic up to the +/- of the diameter endpoints
    assert y2.shape == (4, 2)
    d = np.minimum(np.abs(y2 - y).max(axis=1), np.abs(y2 + y).max(axis=1))
    assert np.all(d < 0.5)  # only observation noise (0.05) separates them


def test_plus_shape_generation():
    np.random.seed(2)
    m = PlusShapeModel()
    x, y = m.sample_joint(3)
    assert x.shape == (3, 100) and y.shape == (3, 4)
    # angle in [0, pi/2], ratio positive
    assert np.all(y[:, 2] >= 0) and np.all(y[:, 2] <= np.pi / 2)
    assert np.all(y[:, 3] > 0)
    curves = m.trace_fourier_curves(m.unflatten_coeffs(x))
    assert np.isfinite(curves).all()


def test_plus_shape_target_conditioned():
    np.random.seed(3)
    m = PlusShapeModel()
    target = (0.75, 0.0, 1.0, 3.0)
    coords, label = m.generate_plus_shape(forward=True, target=target)
    assert label[2] == pytest.approx(1.0)  # angle pinned to target
    assert label[3] == pytest.approx(3.0, abs=1e-6)  # ratio pinned


def test_densify_polyline():
    m = PlusShapeModel()
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    dense = m.densify_polyline(sq, max_dist=0.2)
    seg = np.abs(np.diff(dense, axis=0)).max()
    assert seg <= 0.3


# ---------------------------------------------------------------- UCI (fixtures)


@pytest.fixture
def uci_root(tmp_path):
    root = tmp_path
    rng = np.random.RandomState(7)
    (root / "uci_data/power").mkdir(parents=True)
    (root / "uci_data/miniboone").mkdir(parents=True)
    np.save(root / "uci_data/power/data.npy", rng.rand(1000, 8).astype(np.float64))
    np.save(root / "uci_data/miniboone/data.npy", rng.randn(500, 43).astype(np.float64))
    return str(root)


def test_power_preprocessing(uci_root):
    p = Power(uci_root)
    assert p.trn.shape[1] == 6  # dropped cols 3 and 1 of 8
    # z-scored by train+val moments
    both = np.vstack([p.trn, p.val])
    np.testing.assert_allclose(both.mean(axis=0), 0, atol=1e-10)
    np.testing.assert_allclose(both.std(axis=0), 1, atol=1e-10)
    # deterministic (seeded shuffle)
    p2 = Power(uci_root)
    np.testing.assert_allclose(p.trn, p2.trn)


def test_miniboone_preprocessing(uci_root):
    m = Miniboone(uci_root)
    assert m.trn.shape[1] == 42  # last column dropped
    n = 500
    n_test = int(0.1 * n)
    assert m.tst.shape[0] == n_test


def test_prepare_uci_data(uci_root):
    (x_tr, y_tr), (x_te, y_te) = prepare_uci_data("power", uci_root)
    assert x_tr.dtype == np.float32 and y_tr.shape == (len(x_tr), 1)
    assert (y_te == 0).all()


def test_prepare_toy_data_caching(tmp_path):
    np.random.seed(4)
    m = LensShapeModel()
    cache = str(tmp_path / "data")
    (x1, y1), _ = prepare_toy_data(m, 8, 4, cache_dir=cache)
    (x2, y2), _ = prepare_toy_data(m, 8, 4, cache_dir=cache)  # from cache
    np.testing.assert_allclose(x1, x2)
    np.testing.assert_allclose(y1, y2)
    (x3, _), _ = prepare_toy_data(m, 6, 4, cache_dir=cache)  # subset of cache
    np.testing.assert_allclose(x3, x1[:6])
