"""Smoke tests for the experiment sweep drivers (reference run_experiments /
run_uci_experiments / eval_shapes semantics at toy scale)."""

import numpy as np
import pytest

import hint_tpu.configs.registry_data as rd
from hint_tpu import experiments

CFG = "lens_shape.unconditional_inn_1"


@pytest.fixture()
def tiny_config(monkeypatch):
    small = {**rd.CONFIGS[CFG], "n_epochs": 2, "n_train": 400, "n_test": 120,
             "max_batches_per_epoch": 2, "batch_size": 200}
    monkeypatch.setitem(rd.CONFIGS, CFG, small)
    return CFG


def test_train_and_evaluate_layout(tiny_config, tmp_path):
    out = experiments.train_and_evaluate(
        [tiny_config], n_runs=1, n_eval_samples=6,
        results_dir=str(tmp_path / "results"), cache_dir=str(tmp_path / "data"),
    )
    assert len(out[tiny_config]) == 1
    base = tmp_path / "results" / "lens_shape-unconditional_inn_1_0"
    assert (tmp_path / "results" / "lens_shape-unconditional_inn_1_0.npz").exists()
    assert (tmp_path / "results" / "lens_shape-unconditional_inn_1_0_sample.npy").exists()
    metrics = np.load(str(base) + ".npy")  # lens configs are scored inline
    assert metrics.shape == (4,)
    assert 0.0 <= metrics[0] <= 1.0  # IoU

    # likelihood pass consumes the checkpoint + GT corr
    xtr = np.load(tmp_path / "data" / "lens-shape1_x_train.npy")
    np.save(tmp_path / "data" / "lens-shape1_corr.npy", np.corrcoef(xtr.T))
    res = experiments.test_likelihood(
        [tiny_config], n_runs=1, results_dir=str(tmp_path / "results"),
        cache_dir=str(tmp_path / "data"),
    )
    (ll_mean, _), (corr_mse, _) = res[tiny_config]
    assert np.isfinite(ll_mean) and np.isfinite(corr_mse)

    # collect results prints + returns the metric stack
    out2 = experiments.collect_shape_results(
        [tiny_config], n_runs=1, results_dir=str(tmp_path / "results")
    )
    means, stds = out2[tiny_config]
    assert means.shape == (4,) and np.allclose(stds, 0)


def test_error_swallowing(tmp_path, capsys):
    # unknown config: driver prints the error and continues (reference
    # run_experiments.py:169-173 semantics)
    out = experiments.train_and_evaluate(
        ["nope.not_a_config"], n_runs=1, results_dir=str(tmp_path),
        cache_dir=str(tmp_path),
    )
    assert out["nope.not_a_config"] == []
    assert "ERROR" in capsys.readouterr().out
