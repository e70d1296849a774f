"""Parity tests for the TPU-batched lens prior sweep (data/lens_tpu.py).

The batched Sutherland–Hodgman clip must reproduce the host geometry's
ring *vertex-for-vertex in order* (the DFT start phase depends on ring
order), the DFT must match fourier_coeffs, and the forward process must
match fourier.LensShapeModel.forward_process including the f64 tie-break
refinement. End-to-end parity with the host engine is distributional
(the numpy MT19937 draw stream cannot be reproduced by a threefry
program): two-sample KS per dimension.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hint_tpu.data import geometry as geo
from hint_tpu.data import lens_tpu
from hint_tpu.data.fourier import LensShapeModel


def _host_ring(r0, theta):
    """generate_lens_shape's geometry for fixed draws (no centering)."""
    c0 = geo.circle_polygon(0.0, 0.0, r0)
    r1 = 2 * r0
    d = 0.8 * (r0 + r1)
    c1 = geo.circle_polygon(d * np.sin(theta), d * np.cos(theta), r1)
    return geo.convex_intersection(c0, c1)


def test_ring_order_parity():
    """Batched padded S-H == host S-H, same vertices in the same order."""
    rng = np.random.RandomState(7)
    r0 = (1.0 + rng.rand(48)).astype(np.float32)
    theta = (2 * np.pi * rng.rand(48)).astype(np.float32)
    pts, valid, k = jax.jit(lens_tpu._lens_rings)(jnp.asarray(r0), jnp.asarray(theta))
    pts, valid, k = np.asarray(pts), np.asarray(valid), np.asarray(k)
    for b in range(len(r0)):
        ref = _host_ring(float(r0[b]), float(theta[b]))
        assert k[b] == len(ref), (b, k[b], len(ref))
        assert valid[b, : k[b]].all() and not valid[b, k[b] :].any()
        np.testing.assert_allclose(pts[b, : k[b]], ref, atol=2e-5, rtol=0)


def test_x_parity_fixed_draws():
    """Ring -> centered closed ring -> DFT -> flatten matches the host
    pipeline when (r0, θ, shift) are pinned to the same values."""
    rng = np.random.RandomState(3)
    model = LensShapeModel()
    r0 = (1.0 + rng.rand(16)).astype(np.float32)
    theta = (2 * np.pi * rng.rand(16)).astype(np.float32)
    shift = rng.randn(16, 2).astype(np.float32)
    pts, valid, k = jax.jit(lens_tpu._lens_rings)(jnp.asarray(r0), jnp.asarray(theta))
    x = np.asarray(
        jax.jit(lens_tpu._ring_to_x)(pts, valid, k, jnp.asarray(shift))
    )
    for b in range(len(r0)):
        ring = _host_ring(float(r0[b]), float(theta[b]))
        coords = np.concatenate([ring, ring[:1]], axis=0)
        coords = coords - (coords.mean(axis=0) + 0.5 * shift[b])
        ref = model.flatten_coeffs(model.fourier_coeffs(coords, n_coeffs=5)[None])[0]
        np.testing.assert_allclose(x[b], ref, atol=5e-5, rtol=0)


def test_forward_parity():
    """Device screen + host refine/seam fix == the host forward process
    (noise=0), on real prior samples (which include exact-tie diameters
    and seam-twin rows whose reference argmax lands on (i, 99))."""
    model = LensShapeModel()
    np.random.seed(11)
    x = model.sample_prior(96).astype(np.float32)
    np.random.seed(0)
    ref = model.forward_process(x.copy(), noise=0.0)
    feats, band, seam, i1 = jax.jit(lens_tpu._forward_screen)(jnp.asarray(x))
    feats = np.asarray(feats, np.float64)
    band, seam, i1 = np.asarray(band), np.asarray(seam), np.asarray(i1)
    if band.any():
        feats[band] = lens_tpu._refine_host(x[band])
    seam_only = seam & ~band
    if seam_only.any():
        feats[seam_only] = lens_tpu._seam_host(x[seam_only], i1[seam_only])
    np.testing.assert_allclose(feats, ref, atol=2e-4, rtol=0)


def test_seam_host_matches_full_refine():
    """The cheap twin-orientation path must agree with the full-matrix f64
    refine on every seam-flagged row (both reproduce the reference's
    squareform(pdist) argmax; _seam_host just skips the other 9,998
    distances)."""
    model = LensShapeModel()
    np.random.seed(29)
    x = model.sample_prior(600).astype(np.float32)
    _, band, seam, i1 = jax.jit(lens_tpu._forward_screen)(jnp.asarray(x))
    band, seam, i1 = np.asarray(band), np.asarray(seam), np.asarray(i1)
    rows = seam & ~band
    assert rows.any(), "prior draw produced no seam rows; enlarge the sample"
    fast = lens_tpu._seam_host(x[rows], i1[rows])
    full = lens_tpu._refine_host(x[rows])
    np.testing.assert_array_equal(fast, full)


def test_sample_joint_deterministic_and_shaped():
    x1, y1 = lens_tpu.sample_joint(300, seed=5, sub_batch=256)
    x2, y2 = lens_tpu.sample_joint(300, seed=5, sub_batch=256)
    assert x1.shape == (300, 20) and y1.shape == (300, 2)
    assert x1.dtype == np.float32 and y1.dtype == np.float32
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert np.isfinite(x1).all() and np.isfinite(y1).all()
    x3, _ = lens_tpu.sample_joint(300, seed=6, sub_batch=256)
    assert not np.array_equal(x1, x3)


def test_distribution_matches_host_engine():
    """Two-sample KS per x dimension and per y dimension between the TPU
    engine and the host numpy engine: same prior, same forward process."""
    n = 1500
    xt, yt = lens_tpu.sample_joint(n, seed=123, sub_batch=512)
    model = LensShapeModel()
    np.random.seed(321)
    xh = model.sample_prior(n).astype(np.float32)
    yh = model.forward_process(xh).astype(np.float32)

    def ks(a, b):
        a, b = np.sort(a), np.sort(b)
        grid = np.concatenate([a, b])
        ca = np.searchsorted(a, grid, side="right") / len(a)
        cb = np.searchsorted(b, grid, side="right") / len(b)
        return np.abs(ca - cb).max()

    # critical value at alpha=1e-4 for n=m=1500: c(α)·sqrt(2/n) ≈ 0.0722
    crit = 1.95 * np.sqrt(2.0 / n)
    for d in range(20):
        assert ks(xt[:, d], xh[:, d]) < crit, f"x dim {d}"
    for d in range(2):
        assert ks(yt[:, d], yh[:, d]) < crit, f"y dim {d}"


def test_prepare_samples_tpu_engine(tmp_path):
    from hint_tpu.evaluation.abc import prepare_samples

    x, y = prepare_samples(
        LensShapeModel, n_total=600, out_dir=str(tmp_path), chunk=200, engine="tpu"
    )
    assert x.shape == (600, 20) and y.shape == (600, 2)
    assert np.isfinite(np.asarray(x)).all()
    # resume path: re-invoking returns the cached pool unchanged
    x2, _ = prepare_samples(
        LensShapeModel, n_total=600, out_dir=str(tmp_path), chunk=200, engine="tpu"
    )
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_seam_ulp_tie_matches_scipy_pdist():
    """Seam-twin ulp-tie regression (round-5 audit, VERDICT r4 #5).

    This row, caught by the 100k on-chip audit, has d²(38,99) exceeding its
    seam twin d²(0,38) by only 1.8e-15 (~2 ulp). The reference argmaxes
    squareform(pdist(points)) — sqrt'd distances, data.py:133 — under which
    the twins round EQUAL and row-major first-max picks (0,38). A d²-based
    argmax picks (38,99) and flips the sign of y. Pins that _seam_host (and
    therefore the pool engine) resolves the tie exactly as scipy does.
    """
    from scipy.spatial.distance import pdist, squareform

    x = np.array([[
        0.09095285087823868, 0.4457179307937622, -0.22821182012557983,
        0.4457179307937622, 0.09095285087823868, 0.05451823025941849,
        0.5210657715797424, 0.6912301182746887, 0.5210657715797424,
        0.05451823025941849, 0.10121825337409973, -0.37077128887176514,
        0.0, 0.37077128887176514, -0.10121825337409973, 0.08546189963817596,
        0.03648364916443825, 0.0, -0.03648364916443825, -0.08546189963817596,
    ]], dtype=np.float32)

    model = LensShapeModel()
    pts = model.trace_fourier_curves(model.unflatten_coeffs(x))[0]
    d = squareform(pdist(pts.astype(np.float64)))
    mi = np.unravel_index(d.argmax(), d.shape)
    assert mi == (0, 38), f"fixture no longer hits the seam tie: {mi}"
    p0, p1 = pts[mi[0]].astype(np.float64), pts[mi[1]].astype(np.float64)
    ref = np.array([(p1 - p0)[1], (p1 - p0)[0]])

    # the d² twins really are within a few ulp — the tie the test is about
    d2_twin = ((pts[38].astype(np.float64) - pts[0].astype(np.float64)) ** 2).sum()
    d2_seam = ((pts[99].astype(np.float64) - pts[38].astype(np.float64)) ** 2).sum()
    assert 0 < abs(d2_seam - d2_twin) < 1e-13

    got = lens_tpu._seam_host(x, np.array([38]))[0]
    np.testing.assert_array_equal(got, ref)
