"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.configs import get_config
from hint_tpu.models import builders
from hint_tpu.parallel import batch_sharding, make_mesh
from hint_tpu.train.trainer import Trainer, UNCONDITIONAL


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device():
    """One DP train step over 8 devices must equal the single-device step."""
    m = builders.hint(dim=12, n_blocks=2, c_internal=(16, 8))
    kwargs = dict(model=m, kind=UNCONDITIONAL, batch_size=64, max_batches_per_epoch=1,
                  l2_weight_reg=1.86e-5)
    tr_single = Trainer(**kwargs)
    mesh = make_mesh(8)
    tr_dp = Trainer(mesh=mesh, **kwargs)

    state_s = tr_single.init_state(jax.random.PRNGKey(0))
    state_d = tr_dp.init_state(jax.random.PRNGKey(0))

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 12))
    y = jnp.zeros((64, 0))
    key = jax.random.PRNGKey(2)
    lr = jnp.asarray(1e-3)

    new_s, terms_s = tr_single.step_fn(state_s, x, y, key, lr)
    xd = jax.device_put(x, batch_sharding(mesh))
    yd = jax.device_put(y, batch_sharding(mesh))
    new_d, terms_d = tr_dp.step_fn(state_d, xd, yd, key, lr)

    np.testing.assert_allclose(np.asarray(terms_d), np.asarray(terms_s), atol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s.params), jax.tree.leaves(new_d.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_eval_epoch_matches_single_device():
    """Sharded full-batch eval must equal the single-device eval."""
    m = builders.hint(dim=12, n_blocks=2, c_internal=(16, 8))
    kwargs = dict(model=m, kind=UNCONDITIONAL, batch_size=32, max_batches_per_epoch=2)
    tr_single = Trainer(**kwargs)
    tr_dp = Trainer(mesh=make_mesh(8), **kwargs)
    state = tr_single.init_state(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 12))
    key = jax.random.PRNGKey(2)
    t_s = tr_single.eval_epoch(state.params, x, None, key, full_batch=True)
    t_d = tr_dp.eval_epoch(state.params, x, None, key, full_batch=True)
    np.testing.assert_allclose(np.asarray(t_d), np.asarray(t_s), atol=1e-5)


def test_sample_model_sharded_matches_single_device():
    """Sharded sampling is bit-compatible: same key -> same samples, incl. a
    row count that does not divide the mesh (exercises padding)."""
    from hint_tpu.evaluation.sampling import sample_model

    cfg = get_config("plus_shape.unconditional_hint_4_1")
    trainer = cfg.make_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    for n in (16, 11):
        key = jax.random.PRNGKey(7)
        xs = np.asarray(sample_model(cfg, trainer.model, state.params, n, key))
        xd = np.asarray(sample_model(cfg, trainer.model, state.params, n, key, mesh=mesh))
        assert xd.shape == (n, cfg.ndim_x)
        np.testing.assert_allclose(xd, xs, atol=1e-5)


def test_sample_conditional_hint_sharded_matches():
    from hint_tpu.evaluation.sampling import sample_model

    cfg = get_config("lens_shape.conditional_hint_1_full")
    trainer = cfg.make_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(3)
    yt = np.asarray(cfg.vis_y_target, np.float32)
    xs = np.asarray(sample_model(cfg, trainer.model, state.params, 16, key, y_target=yt))
    xd = np.asarray(
        sample_model(cfg, trainer.model, state.params, 16, key, y_target=yt, mesh=mesh)
    )
    np.testing.assert_allclose(xd, xs, atol=1e-5)


def test_quantile_abc_sharded_matches_single_device():
    from hint_tpu.evaluation.abc import quantile_ABC

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 20)).astype(np.float32)
    y = rng.standard_normal((1000, 2)).astype(np.float32)
    yt = y[3]
    gt_s, thr_s = quantile_ABC(x, y, yt, n=50)
    # non-divisible chunking exercises the pad-rows path
    gt_d, thr_d = quantile_ABC(x, y, yt, n=50, device_chunk=333, mesh=make_mesh(8))
    np.testing.assert_allclose(gt_d, gt_s, atol=0)
    assert abs(thr_d - thr_s) < 1e-6


def test_multi_mmd_sharded_matches_single_device():
    from hint_tpu.evaluation.mmd import multi_mmd

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 20)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((64, 20)).astype(np.float32))
    m_s = float(multi_mmd(x, y))
    m_d = float(multi_mmd(x, y, mesh=make_mesh(8)))
    assert abs(m_d - m_s) < 1e-5


def test_shape_scoring_sharded_matches_single_device():
    """Sharded fits + raster == unsharded (row count 11 exercises padding)."""
    from hint_tpu.evaluation import shape_fit

    rng = np.random.default_rng(3)
    t = np.linspace(0, 2 * np.pi, 64, endpoint=False, dtype=np.float32)
    curves = np.stack(
        [
            np.stack(
                [np.cos(t) * (1 + 0.05 * rng.standard_normal()),
                 np.sin(t) * (1 + 0.05 * rng.standard_normal())], axis=1
            )
            for _ in range(11)
        ]
    ).astype(np.float32)
    mesh = make_mesh(8)
    p_s = shape_fit.fit_lens_shapes_batch(curves)
    p_d = shape_fit.fit_lens_shapes_batch(curves, mesh=mesh)
    np.testing.assert_allclose(p_d, p_s, atol=1e-5)
    outlines = shape_fit.lens_outlines_batch(p_s)
    iou_s, dice_s = shape_fit.iou_and_dice_batch(outlines, curves, resolution=64, chunk=4)
    iou_d, dice_d = shape_fit.iou_and_dice_batch(
        outlines, curves, resolution=64, chunk=4, mesh=mesh
    )
    np.testing.assert_allclose(iou_d, iou_s, atol=1e-6)
    np.testing.assert_allclose(dice_d, dice_s, atol=1e-6)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dp_step_scanned_matches_single_device():
    """DP over 8 devices with a SCANNED deep chain (stacked block params
    replicated, batch sharded) equals the single-device unrolled step —
    the grid's n_blocks >= 16 configs train through exactly this path."""
    scanned = builders.hint(dim=12, n_blocks=4, c_internal=(16, 8), scan_blocks=True)
    unrolled = builders.hint(dim=12, n_blocks=4, c_internal=(16, 8), scan_blocks=False)
    kwargs = dict(kind=UNCONDITIONAL, batch_size=64, max_batches_per_epoch=1,
                  l2_weight_reg=1.86e-5)
    tr_single = Trainer(model=unrolled, **kwargs)
    mesh = make_mesh(8)
    tr_dp = Trainer(model=scanned, mesh=mesh, **kwargs)

    state_s = tr_single.init_state(jax.random.PRNGKey(0))
    state_d = tr_dp.init_state(jax.random.PRNGKey(0))

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 12))
    y = jnp.zeros((64, 0))
    key = jax.random.PRNGKey(2)
    lr = jnp.asarray(1e-3)

    new_s, terms_s = tr_single.step_fn(state_s, x, y, key, lr)
    xd = jax.device_put(x, batch_sharding(mesh))
    yd = jax.device_put(y, batch_sharding(mesh))
    new_d, terms_d = tr_dp.step_fn(state_d, xd, yd, key, lr)

    np.testing.assert_allclose(np.asarray(terms_d), np.asarray(terms_s), atol=1e-5)
    from hint_tpu.models.flow import to_unrolled_tree

    got = to_unrolled_tree(scanned, new_d.params)
    for k in new_s.params:
        for a, b in zip(jax.tree.leaves(new_s.params[k]), jax.tree.leaves(got[k])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
