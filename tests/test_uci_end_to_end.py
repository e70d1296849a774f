"""UCI path end-to-end on synthetic data files (the real datasets are not
in this environment; the byte-parity preprocessing is exercised against
files with the reference layout — uci_data/{power/data.npy,
gas/ethylene_CO.pickle, miniboone/data.npy})."""

import os

import numpy as np
import pytest


@pytest.fixture()
def uci_root(tmp_path):
    rng = np.random.default_rng(0)
    # POWER: 7 raw columns (2 dropped -> 6 + noise recipe needs 5 post-drop?
    # reference drops cols 3 and 1 from a 9-col array -> use 8 cols)
    os.makedirs(tmp_path / "uci_data/power")
    np.save(tmp_path / "uci_data/power/data.npy", rng.standard_normal((2000, 8)))
    # GAS: pickle DataFrame with Meth/Eth/Time + sensors
    import pandas as pd

    os.makedirs(tmp_path / "uci_data/gas")
    n = 1500
    base = rng.standard_normal((n, 10))
    df = pd.DataFrame({"Meth": base[:, 0], "Eth": base[:, 1], "Time": np.arange(n, dtype=float)})
    for i in range(8):
        df[f"S{i}"] = base[:, 2 + i % 8] + 0.01 * rng.standard_normal(n)
    # two highly correlated columns to exercise the corr-pruning loop
    df["S8"] = df["S0"] * 1.0001
    np.random.shuffle  # no-op; keep deterministic
    df.to_pickle(tmp_path / "uci_data/gas/ethylene_CO.pickle")
    # MINIBOONE: 43 cols (last dropped after normalization -> 42)
    os.makedirs(tmp_path / "uci_data/miniboone")
    np.save(tmp_path / "uci_data/miniboone/data.npy", rng.standard_normal((1200, 43)).astype(np.float32))
    return str(tmp_path)


def test_power_loader_shapes(uci_root):
    from hint_tpu.data.uci import Power

    p = Power(uci_root)
    assert p.trn.shape[1] == 6
    # z-scored by train+val moments
    data = np.vstack([p.trn, p.val])
    assert np.allclose(data.mean(axis=0), 0, atol=1e-7)
    assert np.allclose(data.std(axis=0), 1, atol=1e-6)


def test_gas_loader_corr_pruning(uci_root):
    from hint_tpu.data.uci import Gas

    g = Gas(uci_root)
    # the duplicated column must have been pruned
    assert g.trn.shape[1] < 9
    c = np.corrcoef(g.trn.T)
    off = c[~np.eye(c.shape[0], dtype=bool)]
    assert (np.abs(off) <= 0.985).all()


def test_miniboone_loader_drops_last(uci_root):
    from hint_tpu.data.uci import Miniboone

    m = Miniboone(uci_root)
    assert m.trn.shape[1] == 42


def test_uci_training_end_to_end(uci_root, monkeypatch):
    """Full trainer pass over synthetic POWER with the real config plumbing
    (full-batch test semantics, LL conversion)."""
    import jax
    import jax.numpy as jnp

    import hint_tpu.configs.registry_data as rd
    from hint_tpu.configs import get_config

    name = "uci_data.power_inn_4"
    monkeypatch.setitem(
        rd.CONFIGS, name,
        {**rd.CONFIGS[name], "n_epochs": 2, "max_batches_per_epoch": 2, "batch_size": 256},
    )
    cfg = get_config(name)
    (xtr, _), (xte, _) = cfg.load_data(uci_root=uci_root)
    assert xtr.shape[1] == 6
    trainer = cfg.make_trainer()
    state, final = trainer.fit(
        jax.random.PRNGKey(0), (jnp.asarray(xtr), None), (jnp.asarray(xte), None),
        full_batch_test=True,
    )
    ll = -final - (6 / 2) * np.log(2 * np.pi)
    assert np.isfinite(ll)
