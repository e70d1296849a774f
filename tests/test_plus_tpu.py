"""Parity tests for the TPU-batched plus-shape prior sweep (data/plus_tpu.py).

The closed-form union outline must reproduce the host geometry's ring
*vertex-for-vertex in order* (the DFT start phase depends on ring order,
same constraint as the lens engine), the masked densify must match
densify_polyline point-for-point, the pipeline must match the host
generate_plus_shape replay for pinned draws, and end-to-end parity with
the host engine is distributional (two-sample KS per dimension — the
numpy MT19937 draw stream cannot be reproduced by a threefry program).
Reference recipe: /root/reference/data.py:167-252.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hint_tpu.data import geometry as geo
from hint_tpu.data import plus_tpu
from hint_tpu.data.fourier import PlusShapeModel


def _draws(rng, n):
    """Prior draws in f32 (the engine's working precision); the host ref
    consumes the same values widened to f64."""
    xl = (3 + 2 * rng.rand(n)).astype(np.float32)
    yl = (3 + 2 * rng.rand(n)).astype(np.float32)
    xw = (0.5 + 1.5 * rng.rand(n)).astype(np.float32)
    yw = (0.5 + 1.5 * rng.rand(n)).astype(np.float32)
    xs = (-1.5 + 3 * rng.rand(n)).astype(np.float32)
    ys = (-1.5 + 3 * rng.rand(n)).astype(np.float32)
    angle = (0.5 * np.pi * rng.rand(n)).astype(np.float32)
    off = (0.5 * rng.randn(n, 2)).astype(np.float32)
    return xl, yl, xw, yw, xs, ys, angle, off


def _bars(xl, yl, xw, yw, xs, ys, b):
    xbar = (
        (float(xs[b]) - float(xl[b]) / 2, -float(xw[b]) / 2),
        (float(xs[b]) + float(xl[b]) / 2, float(xw[b]) / 2),
    )
    ybar = (
        (-float(yw[b]) / 2, float(ys[b]) - float(yl[b]) / 2),
        (float(yw[b]) / 2, float(ys[b]) + float(yl[b]) / 2),
    )
    return xbar, ybar


def _ring_dev(xl, yl, xw, yw, xs, ys):
    rx, ry, V, margin = jax.jit(plus_tpu._union_ring)(
        jnp.asarray(xs - xl / 2),
        jnp.asarray(xs + xl / 2),
        jnp.asarray(-xw / 2),
        jnp.asarray(xw / 2),
        jnp.asarray(-yw / 2),
        jnp.asarray(yw / 2),
        jnp.asarray(ys - yl / 2),
        jnp.asarray(ys + yl / 2),
    )
    return np.asarray(rx), np.asarray(ry), np.asarray(V), np.asarray(margin)


def test_union_ring_order_parity():
    """Closed-form 4-corner union == host split-and-chain walk, same
    vertices in the same order."""
    rng = np.random.RandomState(7)
    xl, yl, xw, yw, xs, ys, _, _ = _draws(rng, 128)
    rx, ry, V, _ = _ring_dev(xl, yl, xw, yw, xs, ys)
    for b in range(len(xl)):
        xbar, ybar = _bars(xl, yl, xw, yw, xs, ys, b)
        ref = geo.rect_union_outline(xbar, ybar)
        assert V[b] == len(ref), (b, V[b], len(ref))
        got = np.stack([rx[b, : V[b]], ry[b, : V[b]]], axis=1)
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_densify_parity():
    """Masked static-segment densify == host densify_polyline,
    point-for-point including the duplicated shared vertices."""
    rng = np.random.RandomState(11)
    model = PlusShapeModel()
    xl, yl, xw, yw, xs, ys, _, _ = _draws(rng, 64)
    rx, ry, V, _ = _ring_dev(xl, yl, xw, yw, xs, ys)
    px, py, N, _ = jax.jit(plus_tpu._densify)(
        jnp.asarray(rx), jnp.asarray(ry), jnp.asarray(V)
    )
    px, py, N = np.asarray(px), np.asarray(py), np.asarray(N)
    for b in range(len(xl)):
        xbar, ybar = _bars(xl, yl, xw, yw, xs, ys, b)
        ref = model.densify_polyline(geo.rect_union_outline(xbar, ybar))
        assert N[b] == len(ref), (b, N[b], len(ref))
        got = np.stack([px[b, : N[b]], py[b, : N[b]]], axis=1)
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_pipeline_parity_fixed_draws():
    """Full device pipeline (ring -> densify -> transform -> DFT -> pack)
    matches the host f64 replay of generate_plus_shape on the same draws,
    for both x (after host unpack/mirror) and the label y."""
    rng = np.random.RandomState(3)
    xl, yl, xw, yw, xs, ys, angle, off = _draws(rng, 48)
    packed, params = jax.jit(plus_tpu._pipeline)(
        *(jnp.asarray(a) for a in (xl, yl, xw, yw, xs, ys, angle, off))
    )
    packed, params = np.asarray(packed), np.asarray(params)
    x = plus_tpu._unpack_x(packed[:, :50].astype(np.float64))
    y = packed[:, 50:54]
    x_ref, y_ref = plus_tpu._regen_host(params)
    np.testing.assert_allclose(x, x_ref, atol=5e-5, rtol=0)
    np.testing.assert_allclose(y, y_ref, atol=5e-5, rtol=0)


def test_regen_host_matches_model():
    """_regen_host replays generate_plus_shape exactly: patching the rand
    stream to emit pinned draws through the real model must reproduce its
    (x, y) bit-for-bit in f64."""
    import hint_tpu.data.fourier as fourier_mod

    rng = np.random.RandomState(19)
    xl, yl, xw, yw, xs, ys, angle, off = (a.astype(np.float64) for a in _draws(rng, 8))
    params = np.stack([xl, yl, xw, yw, xs, ys, angle, off[:, 0], off[:, 1]], axis=1)
    x_fast, y_fast = plus_tpu._regen_host(params)
    model = PlusShapeModel()
    orig_rand, orig_randn = fourier_mod.rand, fourier_mod.randn
    for b in range(len(xl)):
        seq = iter(
            [
                (xl[b] - 3) / 2,
                (yl[b] - 3) / 2,
                (xw[b] - 0.5) / 1.5,
                (yw[b] - 0.5) / 1.5,
                (xs[b] + 1.5) / 3,
                (ys[b] + 1.5) / 3,
                angle[b] / (0.5 * np.pi),
            ]
        )
        fourier_mod.rand = lambda: next(seq)
        fourier_mod.randn = lambda *s: (off[b] / 0.5).reshape(s)
        try:
            coords, label = model.generate_plus_shape(forward=True)
        finally:
            fourier_mod.rand, fourier_mod.randn = orig_rand, orig_randn
        x_ref = model.flatten_coeffs(model.fourier_coeffs(coords, n_coeffs=25)[None])[0]
        np.testing.assert_allclose(x_fast[b], x_ref.astype(np.float32), atol=1e-6)
        np.testing.assert_allclose(y_fast[b], label.astype(np.float32), atol=1e-6)


def test_sample_joint_deterministic_and_shaped():
    x1, y1 = plus_tpu.sample_joint(300, seed=5, sub_batch=256)
    x2, y2 = plus_tpu.sample_joint(300, seed=5, sub_batch=256)
    assert x1.shape == (300, 100) and y1.shape == (300, 4)
    assert x1.dtype == np.float32 and y1.dtype == np.float32
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert np.isfinite(x1).all() and np.isfinite(y1).all()
    x3, _ = plus_tpu.sample_joint(300, seed=6, sub_batch=256)
    assert not np.array_equal(x1, x3)


def test_distribution_matches_host_engine():
    """Two-sample KS per x dimension and per y dimension between the TPU
    engine and the host numpy engine: same prior, same label law."""
    n = 1200
    xt, yt = plus_tpu.sample_joint(n, seed=123, sub_batch=512)
    model = PlusShapeModel()
    np.random.seed(321)
    xh, yh = model.sample_joint(n)
    xh, yh = xh.astype(np.float32), yh.astype(np.float32)

    def ks(a, b):
        a, b = np.sort(a), np.sort(b)
        grid = np.concatenate([a, b])
        ca = np.searchsorted(a, grid, side="right") / len(a)
        cb = np.searchsorted(b, grid, side="right") / len(b)
        return np.abs(ca - cb).max()

    # critical value at alpha=1e-4 for n=m=1200
    crit = 1.95 * np.sqrt(2.0 / n)
    for d in range(100):
        assert ks(xt[:, d], xh[:, d]) < crit, f"x dim {d}"
    for d in range(4):
        assert ks(yt[:, d], yh[:, d]) < crit, f"y dim {d}"


def test_prepare_samples_tpu_engine(tmp_path):
    from hint_tpu.evaluation.abc import prepare_samples

    x, y = prepare_samples(
        PlusShapeModel, n_total=600, out_dir=str(tmp_path), chunk=200, engine="tpu"
    )
    assert x.shape == (600, 100) and y.shape == (600, 4)
    assert np.isfinite(np.asarray(x)).all()
    x2, _ = prepare_samples(
        PlusShapeModel, n_total=600, out_dir=str(tmp_path), chunk=200, engine="tpu"
    )
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
