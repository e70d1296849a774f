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


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
