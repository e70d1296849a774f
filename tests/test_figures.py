"""Smoke tests for the paper-figure module (headless rendering to files)."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from hint_tpu.monitor import figures


def test_dataset_example_writes_png_and_corr(tmp_path):
    from hint_tpu.data.fourier import LensShapeModel

    np.random.seed(0)
    path = figures.plot_dataset_example(
        LensShapeModel(), limits=(-2.5, 2.5, -2.5, 2.5), n_samples=50, out_dir=str(tmp_path)
    )
    assert os.path.exists(path)
    corr = np.load(tmp_path / "lens-shape1_corr.npy")
    assert corr.shape == (20, 20)


def test_fourier_example_and_metrics_illustration(tmp_path):
    p1 = figures.plot_fouriercurve_example(out_dir=str(tmp_path))
    p2 = figures.metrics_illustration(out_dir=str(tmp_path))
    assert os.path.exists(p1) and os.path.exists(p2)


def test_parameter_sensitivity(tmp_path):
    np.random.seed(1)
    p = figures.show_parameter_sensitivity(n_samples=2, out_dir=str(tmp_path))
    assert os.path.exists(p)


def test_data_stripe_geometry():
    """The data-units-wide bar is a rectangle of the right extent."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    figures._data_stripe(ax, (0.0, 0.0), (10.0, 0.0), width=0.5, color=(0, 0, 0, 0.1))
    (patch,) = ax.patches
    verts = patch.get_xy()
    assert verts[:, 1].min() == -0.25 and verts[:, 1].max() == 0.25
    assert verts[:, 0].min() == 0.0 and verts[:, 0].max() == 10.0
    plt.close(fig)


def test_plot_ablation_grid(tmp_path):
    # one cell per (kind, blocks, depth, size) as campaign.stage_report builds
    cells = {
        ("hint", 4, 0, "base"): {"iou": [0.80, 0.81], "ll": [3.50, 3.52]},
        ("hint", 4, 9, "base"): {"iou": [0.86], "ll": [3.64]},
        ("hint", 8, 1, "base"): {"iou": [0.84], "ll": [3.60]},
        ("inn", 16, 0, "base"): {"iou": [0.89], "ll": [3.65]},
        ("hint", 4, 1, "small"): {"iou": [0.84], "ll": [3.61]},
        ("hint", 8, 0, "small"): {"iou": [float("nan")], "ll": []},  # diverged
    }
    paths = figures.plot_ablation_grid(cells, out_dir=str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["ablation_base.png", "ablation_small.png"]
    for p in paths:
        assert os.path.getsize(p) > 0


def test_plot_ablation_grid_empty(tmp_path):
    assert figures.plot_ablation_grid({}, out_dir=str(tmp_path)) == []
