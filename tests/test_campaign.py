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


def test_report_runs_on_empty(tmp_path, monkeypatch):
    monkeypatch.setattr(campaign, "CAMPAIGN_DIR", str(tmp_path))
    report = campaign.stage_report(abc_dir=str(tmp_path))
    assert "campaign report" in report
