"""Byte-parity pins for the UCI preprocessing recipes.

tests/test_uci_end_to_end.py checks layout (column counts, z-scoring);
these tests pin the *order-sensitive* parts of the recipes against
independently hand-computed answers, so the byte-parity claim does not rest
on layout checks alone:

* GAS: the iterative corr-pruning loop drops the FIRST column whose
  pairwise-|corr|>0.98 count exceeds 1, then recomputes
  (/root/reference/data.py:381-393). On the crafted frame below the drop
  sequence is A, B, D -> kept {C, E, F}; dropping from the other end would
  keep {C, D, F} instead, so the test distinguishes drop order.
* POWER: the RandomState(42) stream is consumed in the exact order
  shuffle -> voltage -> gap -> sm, but the noise is *applied* in hstack
  order gap, voltage, sm, time (data.py:307-323). The test replays that
  stream independently and demands exact equality, so swapping the draw
  order or the column assignment fails.
* MINIBOONE: moments come from train+val only, and the last column is
  dropped AFTER normalization (data.py:428-456).
"""

import os

import numpy as np
import pytest

from hint_tpu.data.uci import Gas, Miniboone, Power


def _gas_frame(pd, n=200):
    """Crafted frame with a hand-computable prune sequence.

    Signed-corr counts at iteration 1 (self included): A,B,C = 3 (positive
    cluster), D,E = 2 (positive pair), F = 1, G = 1 (G is ANTI-correlated
    with the cluster — corr = -1 — and the reference thresholds the SIGNED
    corr at +0.98, so G is never counted, data.py:385-387).

    First-index pruning: drop A -> {B,C}=2 -> drop B -> C=1; then drop D.
    Kept: [C, E, F, G].
    Last-index pruning would instead go E, C, B -> kept [A, D, F, G].
    """
    t = np.linspace(0.0, 1.0, n)
    base = np.sin(2 * np.pi * t) + t
    other = np.cos(5 * np.pi * t)
    rng = np.random.RandomState(0)
    return pd.DataFrame(
        {
            # dropped unconditionally by load_data (data.py:360-363)
            "Meth": rng.rand(n),
            "Eth": rng.rand(n),
            "Time": np.arange(n, dtype=float),
            "A": base,
            "B": 2.0 * base + 0.5,
            "C": 3.0 * base - 1.0,
            "D": other,
            "E": 0.5 * other - 2.0,
            "F": rng.rand(n),
            "G": -base,  # perfect anti-correlation: survives
        }
    )


def test_gas_corr_pruning_drop_order_and_signedness(tmp_path):
    pd = pytest.importorskip("pandas")
    frame = _gas_frame(pd)
    # sanity: clusters exceed the threshold, cross-cluster stays below
    corr = frame[["A", "B", "C", "D", "E", "F", "G"]].corr().values
    assert corr[0, 1] > 0.98 and corr[0, 2] > 0.98 and corr[3, 4] > 0.98
    assert abs(corr[0, 3]) < 0.98 and abs(corr[0, 5]) < 0.98 and abs(corr[3, 5]) < 0.98
    assert corr[0, 6] < -0.98  # anti-correlated, NOT pruned (signed threshold)

    f = str(tmp_path / "ethylene_CO.pickle")
    frame.to_pickle(f)

    cleaned = Gas.load_data_and_clean(f)
    # first-index-drop order keeps exactly [C, E, F, G];
    # last-index order would keep [A, D, F, G] — distinguishable
    assert list(cleaned.columns) == ["C", "E", "F", "G"]
    # and the survivors are z-scored by their own moments (data.py:395)
    np.testing.assert_allclose(cleaned.mean().values, 0.0, atol=1e-12)
    np.testing.assert_allclose(cleaned.std().values, 1.0, atol=1e-12)


def test_power_noise_columns_exact_replay(tmp_path):
    """End-to-end equality against an independent replay of the documented
    recipe: RandomState(42), shuffle, draw voltage THEN gap, apply as
    hstack(gap, voltage, sm, time), delete columns 3 then 1, split 10%/10%
    from the end (data.py:302-335)."""
    n = 50
    raw = np.arange(n * 8, dtype=np.float64).reshape(n, 8)
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "uci_data/power"))
    np.save(os.path.join(root, "uci_data/power/data.npy"), raw)

    tr, va, te = Power.load_data_split_with_noise(root)
    got = np.vstack([tr, va, te])

    # independent replay
    rng = np.random.RandomState(42)
    data = raw.copy()
    rng.shuffle(data)
    data = np.delete(data, 3, axis=1)
    data = np.delete(data, 1, axis=1)
    voltage = 0.01 * rng.rand(n, 1)  # drawn BEFORE gap (data.py:316-318)
    gap = 0.001 * rng.rand(n, 1)
    sm = rng.rand(n, 3)
    expected = data + np.hstack([gap, voltage, sm, np.zeros((n, 1))])
    np.testing.assert_array_equal(got, expected)

    # column-assignment semantics: col0 gets the 1e-3-scale gap noise, col1
    # the 1e-2-scale voltage noise, cols 2-4 unit noise, col5 none
    deltas = got - data
    assert deltas[:, 0].max() < 0.001 and deltas[:, 0].min() >= 0
    assert deltas[:, 1].max() < 0.01 and deltas[:, 1].max() > 0.001  # truly 1e-2 scale
    assert deltas[:, 2:5].max() < 1.0 and deltas[:, 2:5].max() > 0.01
    np.testing.assert_array_equal(deltas[:, 5], 0.0)

    # split sizes: 10% test from the end, then 10% of the remainder as val
    assert te.shape[0] == int(0.1 * n)
    assert va.shape[0] == int(0.1 * (n - te.shape[0]))
    assert tr.shape[0] == n - te.shape[0] - va.shape[0]


def test_power_deleted_columns_are_3_then_1(tmp_path):
    """Deleting 3 then 1 keeps original columns (0,2,4,5,6,7); deleting in
    the other order would keep (0,2,3,5,6,7)."""
    n = 40
    raw = np.tile(np.arange(8, dtype=np.float64) * 100, (n, 1))
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "uci_data/power"))
    np.save(os.path.join(root, "uci_data/power/data.npy"), raw)
    tr, va, te = Power.load_data_split_with_noise(root)
    base = np.floor(np.vstack([tr, va, te]))  # strip sub-unit noise
    np.testing.assert_array_equal(base[0], [0, 200, 400, 500, 600, 700])


def test_miniboone_moments_and_last_column_drop(tmp_path):
    n = 30
    rng = np.random.RandomState(3)
    raw = rng.randn(n, 5) * np.array([1, 2, 3, 4, 5]) + np.array([0, 1, 2, 3, 4])
    f = str(tmp_path / "data.npy")
    np.save(f, raw)

    tr, va, te = Miniboone.load_data_normalised(f)
    # moments from train+val only (data.py:452-456)
    n_te = int(0.1 * n)
    n_va = int(0.1 * (n - n_te))
    trainval = raw[: n - n_te]
    mu, s = trainval.mean(axis=0), trainval.std(axis=0)
    np.testing.assert_allclose(te, (raw[n - n_te :] - mu) / s, rtol=1e-12)
    assert tr.shape[0] == n - n_te - n_va and va.shape[0] == n_va

    # the ctor drops the last column AFTER normalization: width 5 -> 4, and
    # the surviving columns equal the normalized ones (data.py:428-430)
    os.makedirs(str(tmp_path / "uci_data/miniboone"))
    np.save(str(tmp_path / "uci_data/miniboone/data.npy"), raw)
    ds = Miniboone(root=str(tmp_path))
    assert ds.trn.shape[1] == 4
    np.testing.assert_allclose(ds.tst, te[:, :-1], rtol=1e-12)
