"""Tests for the evaluation layer: shape fitting, ABC, comparisons."""

import numpy as np
import pytest

from hint_tpu.data.fourier import LensShapeModel, PlusShapeModel
from hint_tpu.evaluation import abc as abc_mod
from hint_tpu.evaluation import shape_fit


def _plus_curve(seed=0, n_points=100):
    np.random.seed(seed)
    model = PlusShapeModel()
    curve = model.generate_plus_shape()
    coeffs = model.fourier_coeffs(curve, n_coeffs=model.n_parameters // 4)
    return model.trace_fourier_curves(coeffs[None], n_points=n_points)[0].astype(np.float32)


def _lens_curve(seed=0, n_points=100):
    np.random.seed(seed)
    model = LensShapeModel()
    curve = model.generate_lens_shape()
    coeffs = model.fourier_coeffs(curve, n_coeffs=model.n_parameters // 4)
    return model.trace_fourier_curves(coeffs[None], n_points=n_points)[0].astype(np.float32)


def test_plus_fit_quality():
    pts = _plus_curve(seed=1)
    params = shape_fit.fit_plus_shape_to_points(pts)
    iou, dice = shape_fit.iou_and_dice_plus(params, pts)
    assert iou > 0.85, iou  # reference self-check typically lands > 0.9
    assert dice > 0.9, dice
    mh, ah = shape_fit.hausdorff_plus(params, pts)
    assert ah < 0.1


def test_lens_fit_quality():
    pts = _lens_curve(seed=2)
    params = shape_fit.fit_lens_shape_to_points(pts)
    iou, dice = shape_fit.iou_and_dice_lens(params, pts)
    assert iou > 0.8, iou
    assert dice > 0.85, dice


def test_plus_segments_never_degenerate():
    import jax.numpy as jnp

    # arm clamps (best_shape_fit.py:30-33) keep all 12 segments length > 0
    params = jnp.array([0.1, 0.1, 5.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.3])
    segs = np.asarray(shape_fit.plus_segments(params))
    lengths = np.sqrt(np.sum((segs[:, 1] - segs[:, 0]) ** 2, axis=1))
    assert segs.shape == (12, 2, 2)
    assert (lengths > 1e-6).all()


def test_lens_prototype_shape():
    proto = shape_fit.lens_prototype()
    assert proto.shape[1] == 2
    assert proto.shape[0] > 50  # resolution-64 circles give a dense ring
    assert np.allclose(proto.mean(axis=0), 0.0, atol=1e-5)


def test_quantile_abc_selects_nearest():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5000, 6)).astype(np.float32)
    y = x[:, :2] * 2.0  # deterministic forward process
    y_target = np.array([0.5, -0.25], np.float32)
    sample, threshold = abc_mod.quantile_ABC(x, y, y_target, n=100)
    assert sample.shape == (100, 6)
    # all selected must be within threshold of target
    d = np.sqrt(np.sum((sample[:, :2] * 2.0 - y_target) ** 2, axis=1))
    assert (d <= threshold + 1e-5).all()
    # excludes the single nearest neighbour (reference [1:] slice)
    d_all = np.sqrt(np.sum((y - y_target) ** 2, axis=1))
    nearest = np.argmin(d_all)
    assert not any(np.allclose(x[nearest], s) for s in sample[:5])


def test_quantile_abc_chunking_invariant():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3000, 4)).astype(np.float32)
    y = x[:, :2]
    y_target = np.array([0.1, 0.2], np.float32)
    s1, t1 = abc_mod.quantile_ABC(x, y, y_target, n=50, device_chunk=10_000_000)
    s2, t2 = abc_mod.quantile_ABC(x, y, y_target, n=50, device_chunk=700)
    assert np.allclose(np.sort(s1, axis=0), np.sort(s2, axis=0), atol=1e-6)
    assert abs(t1 - t2) < 1e-5


def test_prepare_samples_cache(tmp_path):
    out = str(tmp_path / "abc")
    x, y = abc_mod.prepare_samples(LensShapeModel, n_total=40, chunk=20, out_dir=out, n_workers=2)
    assert x.shape == (40, 20) and y.shape == (40, 2)
    # second call hits the cache
    x2, _ = abc_mod.prepare_samples(LensShapeModel, n_total=40, chunk=20, out_dir=out)
    assert np.allclose(np.asarray(x), np.asarray(x2))


def test_compare_unconditional_smoke(tmp_path):
    model = LensShapeModel()
    abc_dir = str(tmp_path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, model.n_parameters)).astype(np.float32)
    np.save(tmp_path / f"{model.name}_x_huge.npy", x)

    samplers = {
        "identity": lambda z: z,  # N(0,I) "model"
        "offset": lambda z: z + 3.0,  # clearly worse
    }
    out = abc_mod.compare_unconditional(
        model, samplers, n_runs=2, sample_size=64, abc_dir=abc_dir, verbose=False,
        seed=7,
    )
    assert len(out["identity"]["mmds"]) == 2
    # x_huge is N(0,I) so the identity sampler must beat the offset one
    assert np.mean(out["identity"]["mmds"]) < np.mean(out["offset"]["mmds"])


def test_compare_conditional_resume(tmp_path):
    """The multi-hour conditional sweep checkpoints partial progress and a
    resumed run (a) skips finished targets and (b) draws the same per-target
    latents as an uninterrupted sweep."""
    import shutil

    model = LensShapeModel()
    abc_dir = str(tmp_path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((300, model.n_parameters)).astype(np.float32)
    y = rng.standard_normal((300, model.n_observations)).astype(np.float32)
    np.save(tmp_path / f"{model.name}_x_huge.npy", x)
    np.save(tmp_path / f"{model.name}_y_huge.npy", y)

    calls = []

    def sampler(y_tiled, z):
        calls.append(z.copy())
        return np.asarray(z)

    full = abc_mod.compare_conditional(
        model, {"m": sampler}, n_runs=2, sample_size=32, abc_dir=abc_dir,
        run=0, seed=5, verbose=False, checkpoint_every=1,
    )
    z_full = [c.copy() for c in calls]
    assert len(full["m"]["mmds"]) == 2

    # simulate an interruption after target 0: partial with 1 finished target
    calls.clear()
    partial = {"m": {k: v[:1] for k, v in full["m"].items()}}
    with open(tmp_path / f"{model.name}_conditional_comparison_1.pkl.partial", "wb") as f:
        import pickle

        pickle.dump(partial, f)
    resumed = abc_mod.compare_conditional(
        model, {"m": sampler}, n_runs=2, sample_size=32, abc_dir=abc_dir,
        run=1, seed=5, verbose=False, checkpoint_every=1,
    )
    assert len(calls) == 1  # only the unfinished target ran
    np.testing.assert_allclose(calls[0], z_full[1])  # same latent stream
    assert len(resumed["m"]["mmds"]) == 2
    assert not (tmp_path / f"{model.name}_conditional_comparison_1.pkl.partial").exists()


def test_compare_conditional_plus_shape(tmp_path):
    """Plus-shape targets must come from the joint sampler (its
    forward_process is a center-only estimate of the wrong dimension) and the
    forward-distance metric must be skipped (NaN), not crash."""
    from hint_tpu.data.fourier import PlusShapeModel

    model = PlusShapeModel()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, model.n_parameters)).astype(np.float32)
    y = rng.standard_normal((200, model.n_observations)).astype(np.float32)
    np.save(tmp_path / f"{model.name}_x_huge.npy", x)
    np.save(tmp_path / f"{model.name}_y_huge.npy", y)
    out = abc_mod.compare_conditional(
        model, {"m": lambda yt, z: np.asarray(z)}, n_runs=2, sample_size=16,
        abc_dir=str(tmp_path), run=0, seed=1, verbose=False, checkpoint_every=0,
    )
    assert len(out["m"]["mmds"]) == 2
    assert np.isfinite(out["m"]["mmds"]).all()
    assert np.isnan(out["m"]["dists"]).all()  # no true forward map for plus


def test_accumulate_metrics(tmp_path):
    import pickle

    for i in range(3):
        d = {"m": {"mmds": [0.1 * (i + 1), 0.2 * (i + 1)], "times": [0.0, 0.0]}}
        with open(tmp_path / f"toy_unconditional_comparison_{i}.pkl", "wb") as f:
            pickle.dump(d, f)
    res = abc_mod.accumulate_metrics("toy", False, ["m"], abc_dir=str(tmp_path))
    assert res["m"][0] == pytest.approx(np.mean([0.15, 0.3, 0.45]))
