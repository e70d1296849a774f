"""Campaign orchestration sanity: model sets resolve, samplers build from
checkpoints and honor the shared-z comparison interfaces."""

import json
import os

import jax
import numpy as np
import pytest

from hint_tpu.configs import get_config
from hint_tpu.experiments import campaign


def test_model_sets_resolve():
    for (family, kind), configs in campaign.MODEL_SETS.items():
        for name in configs:
            cfg = get_config(name)
            assert cfg.is_conditional == (kind == "conditional"), name
            assert not cfg.vestigial


def test_samplers_from_checkpoints(tmp_path, monkeypatch):
    """Round-trip: save tiny checkpoints at campaign paths, build samplers,
    check the unconditional f(z)->x and conditional f(y,z)->x contracts."""
    import dataclasses

    from hint_tpu.train import checkpoint

    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path))

    shrunk = {
        "lens_shape.unconditional_inn_1": dict(hidden=8),
        "lens_shape.conditional_cinn_1": dict(hidden=8),
        "lens_shape.conditional_hint_1_full": dict(
            hidden=8, c_internal=(8, 4), hidden_y=4
        ),
    }

    real_get = campaign._load_state

    def fake_load(config, seed, dtype="float32"):
        cfg = dataclasses.replace(get_config(config), **shrunk[config])
        trainer = cfg.make_trainer(compute_dtype=dtype)
        state = trainer.init_state(jax.random.PRNGKey(seed))
        return cfg, trainer, state

    monkeypatch.setattr(campaign, "_load_state", fake_load)

    samplers = campaign.make_samplers(list(shrunk), seed=0)
    z = np.random.RandomState(0).randn(8, 20).astype(np.float32)
    y = np.random.RandomState(1).randn(8, 2).astype(np.float32)

    x = np.asarray(samplers["lens_shape.unconditional_inn_1"](z))
    assert x.shape == (8, 20) and np.isfinite(x).all()
    x = np.asarray(samplers["lens_shape.conditional_cinn_1"](y, z))
    assert x.shape == (8, 20) and np.isfinite(x).all()
    x = np.asarray(samplers["lens_shape.conditional_hint_1_full"](y, z))
    assert x.shape == (8, 20) and np.isfinite(x).all()


def test_train_log_is_the_durable_record(tmp_path, monkeypatch):
    """stage_train must skip a (config, seed) whose train_log entry exists
    even when its .npz was cleaned up (checkpoints are gitignored bulk),
    and _load_state must replay the run to regenerate the checkpoint."""
    import dataclasses

    import hint_tpu.configs as configs_mod

    name = "lens_shape.unconditional_inn_1"
    real_get = configs_mod.get_config
    tiny = dataclasses.replace(
        real_get(name), hidden=8, n_epochs=1, batch_size=64,
        n_train=128, n_test=64,
    )

    def fake_get(n):
        assert n == name
        return tiny

    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path))
    monkeypatch.setattr(configs_mod, "get_config", fake_get)
    monkeypatch.setattr(campaign, "MODEL_SETS", {("lens", "unconditional"): [name],
                                                 ("lens", "conditional"): []})

    cache = str(tmp_path / "cache")
    campaign.stage_train("lens", seeds=(0,), cache_dir=cache, configs=[name])
    log = campaign._read_log()
    key = f"{name}|s0|float32"
    assert key in log and np.isfinite(log[key]["final_test_loss"])
    ckpt = campaign._ckpt_path(name, 0)
    assert os.path.exists(ckpt)
    logged_minutes = log[key]["minutes"]

    # delete the checkpoint: stage_train must NOT retrain (log is durable)
    os.remove(ckpt)
    campaign.stage_train("lens", seeds=(0,), cache_dir=cache, configs=[name])
    assert not os.path.exists(ckpt)
    assert campaign._read_log()[key]["minutes"] == logged_minutes


def test_load_state_replays_cleaned_checkpoint(tmp_path, monkeypatch):
    import dataclasses
    import functools

    import hint_tpu.configs as configs_mod

    name = "lens_shape.unconditional_inn_1"
    real_get = configs_mod.get_config
    tiny = dataclasses.replace(
        real_get(name), hidden=8, n_epochs=1, batch_size=64,
        n_train=128, n_test=64,
    )
    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path))
    monkeypatch.setattr(configs_mod, "get_config", lambda n: tiny)
    cache = str(tmp_path / "cache")

    campaign.stage_train("lens", seeds=(0,), cache_dir=cache, configs=[name])
    ckpt = campaign._ckpt_path(name, 0)
    with np.load(ckpt) as f:
        orig = {k: f[k].copy() for k in f.files}
    os.remove(ckpt)

    # _retrain_ckpt defaults cache_dir="data"; point it at the test cache
    monkeypatch.setattr(
        campaign, "_retrain_ckpt",
        functools.partial(campaign._retrain_ckpt, cache_dir=cache),
    )
    cfg, trainer, state = campaign._load_state(name, 0)
    assert os.path.exists(ckpt)
    with np.load(ckpt) as f:
        replay = {k: f[k].copy() for k in f.files}
    assert set(orig) == set(replay)
    for k in orig:
        if orig[k].dtype.kind == "f":
            np.testing.assert_allclose(orig[k], replay[k], rtol=0, atol=1e-5)


def test_report_runs_on_empty(tmp_path, monkeypatch):
    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path))
    report = campaign.stage_report(abc_dir=str(tmp_path))
    assert "campaign report" in report


def test_report_does_not_mix_gt_bases(tmp_path, monkeypatch):
    """MMDs scored against different-size GT pools are incomparable (the
    quantile threshold scales as (N1/N2)^(1/d_y)); the report must publish
    only the sharpest consistent run group, not blend a fresh 1e8-GT run
    with archived 1e7-era runs into one mean ± std."""
    import pickle

    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path))
    abc_dir = tmp_path / "abc"
    abc_dir.mkdir()
    arch = tmp_path / "comparisons"
    arch.mkdir()

    # fresh run 0 in abc/ next to its (tiny stand-in) pool
    np.save(abc_dir / "lens-shape1_x_huge.npy", np.zeros((128, 20), np.float32))
    rec0 = {"lens_shape.conditional_cinn_4":
            {"mmds": [0.010], "rejects": [0.0], "dists": [0.10]}}
    with open(abc_dir / "lens-shape1_conditional_comparison_0.pkl", "wb") as f:
        pickle.dump(rec0, f)

    # archived runs 1-2 from an older, unrecorded (1e7-era) basis
    for run, mmd in ((1, 0.5), (2, 0.9)):
        rec = {"lens_shape.conditional_cinn_4":
               {"mmds": [mmd], "rejects": [0.0], "dists": [0.2]}}
        with open(arch / f"lens-shape1_conditional_comparison_{run}.pkl",
                  "wb") as f:
            pickle.dump(rec, f)

    report = campaign.stage_report(abc_dir=str(abc_dir))
    # only the fresh run is published; its MMD appears un-averaged
    assert "mean ± std over 1 training run)" in report
    assert "0.0100" in report
    assert "0.5" not in report.split("## lens conditional")[1].split("##")[0] \
        .split("excluded")[0]
    # the excluded runs are called out, not silently dropped
    assert "Run 1 excluded" in report and "Run 2 excluded" in report
    # a consistent archived-only group (no fresh pickle) still reports all
    # runs together: same-basis runs must keep accumulating
    os.remove(abc_dir / "lens-shape1_conditional_comparison_0.pkl")
    with open(arch / "lens-shape1_conditional_comparison_0.pkl", "wb") as f:
        pickle.dump(rec0, f)
    report2 = campaign.stage_report(abc_dir=str(abc_dir))
    assert "mean ± std over 3 training runs)" in report2


def test_ablation_grid_resolves():
    """Every grid entry is a registered plus-shape config; the grid plus
    MODEL_SETS covers the reference's full train list, including the
    conditional _8 pair and recursive_cinn (run_experiments.py:29-88)."""
    for name in campaign.ABLATION_GRID:
        cfg = get_config(name)
        assert name.startswith("plus_shape."), name
        assert not cfg.vestigial
    covered = set(campaign.ABLATION_GRID)
    for (family, _), configs in campaign.MODEL_SETS.items():
        covered |= set(configs)
    for must in (
        "plus_shape.conditional_hint_8_full",
        "plus_shape.conditional_cinn_8",
        "plus_shape.conditional_recursive_cinn_4",
    ):
        assert must in covered, must


def test_grid_key_parses_ablation_axes():
    gk = campaign._grid_key
    assert gk("plus_shape.unconditional_hint_4_full") == ("hint", 4, 9, "base")
    assert gk("plus_shape.unconditional_hint_16_1") == ("hint", 16, 1, "base")
    assert gk("plus_shape.unconditional_hint_32_0_small") == ("hint", 32, 0, "small")
    assert gk("plus_shape.unconditional_hint_8_2_big") == ("hint", 8, 2, "big")
    assert gk("plus_shape.unconditional_inn_8") == ("inn", 8, 0, "base")
    # controls and conditionals are not grid cells
    assert gk("plus_shape.unconditional_hint_4_full_reshuffle") is None
    assert gk("plus_shape.conditional_hint_8_full") is None


def test_uci_stage_skips_cleanly_without_data(tmp_path, capsys):
    """VERDICT r2 #6: the one-command UCI stage must no-op with a clear
    message (expected file layout) when the real data files are absent."""
    campaign.stage_uci(uci_root=str(tmp_path))
    out = capsys.readouterr().out
    assert "no datasets present" in out
    for path in campaign.UCI_FILES.values():
        assert path in out
    present = campaign.uci_datasets_present(str(tmp_path))
    assert present == {"power": False, "gas": False, "miniboone": False}


def test_divergence_section_from_probe_json(tmp_path):
    """The report's divergence analysis reads instrumented-rerun probes and
    pins the blowup to its step/LR; a clean probe reports 'none'."""
    steps = [
        {"epoch": 0, "batch": i, "lr": 3e-4, "loss": [1.0, -2.0],
         "max_abs_logdet": 100.0, "max_abs_z": 3.0,
         "grad_norm": 150.0, "grad_max": 4.0}
        for i in range(5)
    ]
    blown = dict(steps[-1], epoch=3, batch=0, lr=7.6e-3, loss=[1e30, 5.0],
                 grad_norm=float("inf"))
    ok_after = dict(steps[-1], epoch=3, batch=1)
    with open(tmp_path / "diverge_cfgA_s0.json", "w") as f:
        json.dump({"config": "cfgA", "seed": 0, "batches_per_epoch": 5,
                   "steps": steps + [blown, ok_after]}, f)
    with open(tmp_path / "diverge_cfgB_s1.json", "w") as f:
        json.dump({"config": "cfgB", "seed": 1, "batches_per_epoch": 5,
                   "steps": steps}, f)
    lines = campaign._divergence_section(probe_dir=str(tmp_path))
    text = "\n".join(lines)
    assert "| cfgA s0 | e3 b0 (step 5) | 7.60e-03 | 1.5e+02 | 100 | yes, then re-blows |" in text
    assert "| cfgB s1 | none in 5 steps" in text
    assert "Mechanism" in text
    # no probes -> no section
    assert campaign._divergence_section(probe_dir=str(tmp_path / "empty")) == []


def test_score_shapes_all_nonfinite_returns_nan():
    """A fully-diverged model (all curves non-finite) must score as NaN,
    not crash the sweep (regression for the empty np.stack)."""
    from hint_tpu.data.fourier import PlusShapeModel
    from hint_tpu.experiments.drivers import _score_shapes

    x = np.full((5, 100), np.nan, np.float32)
    m = _score_shapes(PlusShapeModel(), x, "plus")
    assert m.shape == (4,) and np.isnan(m).all()


def test_batch_fitters_accept_empty_input():
    from hint_tpu.evaluation import shape_fit

    assert shape_fit.fit_plus_shapes_batch(
        np.zeros((0, 2, 64), np.float32)
    ).shape == (0, 9)
    assert shape_fit.fit_lens_shapes_batch(
        np.zeros((0, 2, 64), np.float32)
    ).shape == (0, 4)


def test_figures_stage_skips_without_checkpoints(tmp_path, monkeypatch):
    # no checkpoints, no ABC pools: only the five static figures render,
    # every model panel is skipped with a message instead of raising
    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path / "camp"))
    paths = campaign.stage_figures(
        seed=0,
        out_dir=str(tmp_path / "figs"),
        cache_dir=str(tmp_path / "cache"),
        abc_dir=str(tmp_path / "abc"),
    )
    assert len(paths) == 5
    for p in paths:
        assert os.path.getsize(p) > 0
    # dataset examples must have written the prior-corr GT files
    assert os.path.exists(tmp_path / "cache" / "plus-shape_corr.npy")
    assert os.path.exists(tmp_path / "cache" / "lens-shape1_corr.npy")
