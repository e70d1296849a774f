"""ScannedRepeat wiring: config-level scan_blocks, layout converters,
init parity, checkpoint layout canonicalization, and training parity.

The deep grid configs (n_blocks >= 16, e.g.
/root/reference/configs/plus_shape/unconditional_hint_32_0_big.py) repeat one
block pattern; scanning it (models/flow.py:ScannedRepeat) makes compile time
O(1) in depth. These tests pin the contract that makes scan a pure
performance knob: a scanned build trains bit-identically to the unrolled
build (same init, same steps) and reads/writes the same checkpoints.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hint_tpu.configs import get_config
from hint_tpu.models import builders
from hint_tpu.models.flow import (
    Flow,
    ScannedRepeat,
    to_stacked_tree,
    to_unrolled_tree,
    unrolled_view,
)
from hint_tpu.train import checkpoint
from hint_tpu.train.trainer import Trainer


def _tiny_pair(n_blocks=16, dim=8):
    """(scanned, unrolled) builds of the same deep hint chain."""
    kw = dict(c_internal=(12, 8), perm_fixed=True)
    return (
        builders.hint(dim, n_blocks, scan_blocks=True, **kw),
        builders.hint(dim, n_blocks, scan_blocks=False, **kw),
    )


def _trainer(model, **over):
    kw = dict(
        kind="unconditional", lr_init=0.01, pre_low_lr=0, n_epochs=1,
        batch_size=16, max_batches_per_epoch=2, init_scale=0.005,
        l2_weight_reg=1e-5,
    )
    kw.update(over)
    return Trainer(model=model, **kw)


def test_unrolled_view_matches_unrolled_build():
    scanned, unrolled = _tiny_pair()
    view = unrolled_view(scanned)
    assert len(view.bijectors) == len(unrolled.bijectors)
    for a, b in zip(view.bijectors, unrolled.bijectors):
        assert type(a) is type(b)
    # identity for unscanned models (same object, no copy)
    assert unrolled_view(unrolled) is unrolled


def test_layout_converters_roundtrip():
    scanned, _ = _tiny_pair()
    params = scanned.init(jax.random.PRNGKey(0))
    unrolled_tree = to_unrolled_tree(scanned, params)
    # unrolled layout has one entry per unrolled op
    assert len(unrolled_tree) == len(unrolled_view(scanned).bijectors)
    back = to_stacked_tree(scanned, unrolled_tree)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # identity for unscanned models (same object)
    _, unrolled = _tiny_pair()
    p2 = unrolled.init(jax.random.PRNGKey(0))
    assert to_unrolled_tree(unrolled, p2) is p2
    assert to_stacked_tree(unrolled, p2) is p2


def test_init_state_bit_identical_across_layouts():
    """Trainer.init_state draws keys in the unrolled view, so the scanned
    build starts from bit-identical weights (incl. the init_scale overwrite
    of train_unconditional.py:165-167)."""
    scanned, unrolled = _tiny_pair()
    s_scan = _trainer(scanned).init_state(jax.random.PRNGKey(7))
    s_unroll = _trainer(unrolled).init_state(jax.random.PRNGKey(7))
    got = to_unrolled_tree(scanned, s_scan.params)
    for k in s_unroll.params:
        for a, b in zip(jax.tree.leaves(s_unroll.params[k]), jax.tree.leaves(got[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_step_parity_scanned_vs_unrolled():
    """Identical data + seed -> identical loss terms and updated params
    across the two layouts (the scan is a pure compile-time transform)."""
    scanned, unrolled = _tiny_pair(n_blocks=4)  # small: CPU test budget
    tr_s, tr_u = _trainer(scanned), _trainer(unrolled)
    st_s = tr_s.init_state(jax.random.PRNGKey(3))
    st_u = tr_u.init_state(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    y = jnp.zeros((16, 0))
    k, lr = jax.random.PRNGKey(2), jnp.asarray(1e-3)
    st_s, terms_s = tr_s.step_fn(st_s, x, y, k, lr)
    st_u, terms_u = tr_u.step_fn(st_u, x, y, k, lr)
    np.testing.assert_allclose(np.asarray(terms_s), np.asarray(terms_u), atol=1e-6)
    got = to_unrolled_tree(scanned, st_s.params)
    for key in st_u.params:
        for a, b in zip(jax.tree.leaves(st_u.params[key]), jax.tree.leaves(got[key])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_checkpoint_layout_canonical_cross_load(tmp_path):
    """A checkpoint written by either build loads into either build: the
    on-disk layout is always unrolled (train/checkpoint.py)."""
    scanned, unrolled = _tiny_pair(n_blocks=4)
    tr_s, tr_u = _trainer(scanned), _trainer(unrolled)
    st_s = tr_s.init_state(jax.random.PRNGKey(5))
    # advance one step so mu/nu are nonzero
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    st_s, _ = tr_s.step_fn(st_s, x, jnp.zeros((16, 0)), jax.random.PRNGKey(2), jnp.asarray(1e-3))

    p_scan = str(tmp_path / "scan.npz")
    checkpoint.save_npz(p_scan, st_s, model=scanned)

    # scanned file -> unrolled build
    st_u = checkpoint.load_npz(p_scan, tr_u.init_state(jax.random.PRNGKey(9)), model=unrolled)
    got = to_unrolled_tree(scanned, st_s.params)
    for key in st_u.params:
        for a, b in zip(jax.tree.leaves(st_u.params[key]), jax.tree.leaves(got[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(st_u.opt.step) == int(st_s.opt.step)

    # unrolled file -> scanned build
    p_unroll = str(tmp_path / "unroll.npz")
    checkpoint.save_npz(p_unroll, st_u, model=unrolled)
    st_s2 = checkpoint.load_npz(p_unroll, tr_s.init_state(jax.random.PRNGKey(11)), model=scanned)
    for a, b in zip(jax.tree.leaves(st_s.params), jax.tree.leaves(st_s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st_s.opt.mu), jax.tree.leaves(st_s2.opt.mu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_auto_scan_resolution():
    """Auto: scan deep single-lane chains only (n_blocks >= 16)."""
    assert get_config("plus_shape.unconditional_inn_16").resolve_scan_blocks() is True
    assert get_config("plus_shape.unconditional_inn_32").resolve_scan_blocks() is True
    assert get_config("plus_shape.unconditional_hint_16_1").resolve_scan_blocks() is True
    assert get_config("plus_shape.unconditional_inn_4").resolve_scan_blocks() is False
    assert get_config("plus_shape.unconditional_hint_4_full").resolve_scan_blocks() is False
    # conditional / two-lane graphs have no scan path
    assert get_config("plus_shape.conditional_cinn_8").resolve_scan_blocks(True) is False
    # explicit override
    assert get_config("plus_shape.unconditional_inn_4").resolve_scan_blocks(True) is True
    assert get_config("plus_shape.unconditional_inn_32").resolve_scan_blocks(False) is False


def test_config_build_model_scans():
    m = get_config("plus_shape.unconditional_inn_16").build_model()
    assert isinstance(m, Flow)
    assert any(isinstance(b, ScannedRepeat) for b in m.bijectors)
    m_off = get_config("plus_shape.unconditional_inn_16").build_model(scan_blocks=False)
    assert not any(isinstance(b, ScannedRepeat) for b in m_off.bijectors)
    m_hint = get_config("plus_shape.unconditional_hint_16_1").build_model()
    assert any(isinstance(b, ScannedRepeat) for b in m_hint.bijectors)


def test_config_epoch_parity_scanned_vs_unrolled():
    """One epoch of a real (shrunken) 16-block config: identical losses
    either way — the VERDICT-4 config-level parity gate."""
    cfg = get_config("plus_shape.unconditional_inn_16")
    cfg = dataclasses.replace(
        cfg, hidden=16, n_epochs=1, pre_low_lr=0, batch_size=16,
        max_batches_per_epoch=2,
    )
    tr_s = cfg.make_trainer(scan_blocks=True)
    tr_u = cfg.make_trainer(scan_blocks=False)
    rng = np.random.RandomState(0)
    x = rng.randn(64, cfg.ndim_x).astype(np.float32)
    xt = rng.randn(32, cfg.ndim_x).astype(np.float32)
    _, final_s = tr_s.fit(jax.random.PRNGKey(0), (jnp.asarray(x), None), (jnp.asarray(xt), None))
    _, final_u = tr_u.fit(jax.random.PRNGKey(0), (jnp.asarray(x), None), (jnp.asarray(xt), None))
    assert final_s == pytest.approx(final_u, abs=1e-5)
