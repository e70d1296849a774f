"""Native (C++) toy-data generator: geometry parity with the numpy pipeline
and distributional agreement of the batch samplers."""

import numpy as np
import pytest

from hint_tpu.data import geometry

native = pytest.importorskip("hint_tpu.data.native")
if not native.available():  # no compiler in this environment
    pytest.skip("libhintgeom.so unavailable", allow_module_level=True)


def test_lens_ring_parity():
    rng = np.random.default_rng(0)
    for k in range(25):
        r0 = 1 + rng.random()
        r1 = 2 * r0
        th = 2 * np.pi * rng.random()
        d = 0.8 * (r0 + r1)
        cx, cy = d * np.sin(th), d * np.cos(th)
        a = geometry.convex_intersection(
            geometry.circle_polygon(0, 0, r0), geometry.circle_polygon(cx, cy, r1)
        )
        b = native.lens_ring(0, 0, r0, cx, cy, r1)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_plus_outline_parity():
    rng = np.random.default_rng(1)
    for k in range(25):
        xl, yl = 3 + 2 * rng.random(), 3 + 2 * rng.random()
        xw, yw = 0.5 + 1.5 * rng.random(), 0.5 + 1.5 * rng.random()
        xs, ys = -1.5 + 3 * rng.random(), -1.5 + 3 * rng.random()
        xbar = ((xs - xl / 2, -xw / 2), (xs + xl / 2, xw / 2))
        ybar = ((-yw / 2, ys - yl / 2), (yw / 2, ys + yl / 2))
        a = geometry.rect_union_outline(xbar, ybar)
        b = native.plus_outline(xl, yl, xw, yw, xs, ys)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-9)


@pytest.mark.parametrize("name,dx,dy", [("lens-shape", 20, 2), ("plus-shape", 100, 4)])
def test_batch_sampler_shapes_and_determinism(name, dx, dy):
    x1, y1 = native.sample_joint(name, 64, seed=7)
    x2, y2 = native.sample_joint(name, 64, seed=7)
    assert x1.shape == (64, dx) and y1.shape == (64, dy)
    np.testing.assert_array_equal(x1, x2)  # seeded determinism
    x3, _ = native.sample_joint(name, 64, seed=8)
    assert not np.allclose(x1, x3)


def test_lens_distribution_matches_numpy():
    from hint_tpu.data.fourier import LensShapeModel

    np.random.seed(0)
    xn, yn = native.sample_joint("lens-shape", 2000, seed=3)
    xp, yp = LensShapeModel().sample_joint(2000)
    assert np.abs(xn.mean(0) - xp.mean(0)).max() < 0.08
    assert np.abs(xn.std(0) - xp.std(0)).max() < 0.08
    assert np.abs(yn.mean(0) - yp.mean(0)).max() < 0.15


def test_prepare_toy_data_native_engine(tmp_path):
    from hint_tpu.data.fourier import LensShapeModel
    from hint_tpu.data.loaders import prepare_toy_data

    (xtr, ytr), (xte, yte) = prepare_toy_data(
        LensShapeModel(), 128, 32, str(tmp_path), engine="native"
    )
    assert xtr.shape == (128, 20) and yte.shape == (32, 2)
    # zero-variance dims (imag of m=0 DFT coefficient) preserved
    assert np.allclose(xtr[:, 12], 0, atol=1e-6) and np.allclose(xtr[:, 17], 0, atol=1e-6)
