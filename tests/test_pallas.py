"""Whole-block fused Pallas kernel parity vs the XLA levelwise engine.

On CPU the kernel runs in interpreter mode (same program, no Mosaic), so
these tests validate kernel logic + custom-vjp wiring everywhere; on a TPU
host they compile for real.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hint_tpu.ops.hac import HierarchicalAffineCoupling


def _pair(dim, **kw):
    a = HierarchicalAffineCoupling(dim=dim, impl="levelwise", **kw)
    b = dataclasses.replace(a, impl="fused")
    return a, b


@pytest.mark.parametrize("dim,max_splits", [(6, -1), (11, -1), (20, 2)])
def test_fused_matches_levelwise_forward(dim, max_splits):
    xla, fused = _pair(dim, c_internal=(128,), max_splits=max_splits)
    params = xla.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (9, dim))
    z1, ld1 = xla.forward(params, x)
    z2, ld2 = fused.forward(params, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)


def test_fused_matches_levelwise_inverse():
    xla, fused = _pair(10, c_internal=(128,))
    params = xla.init(jax.random.PRNGKey(2))
    z = jax.random.normal(jax.random.PRNGKey(3), (7, 10))
    x1, ld1 = xla.inverse(params, z)
    x2, ld2 = fused.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)


def test_fused_conditional_matches_levelwise():
    """cond concatenated at every tree level (hint.py:43-45,76)."""
    xla, fused = _pair(8, c_internal=(64,), cond_dim=3)
    params = xla.init(jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (6, 8))
    c = jax.random.normal(jax.random.PRNGKey(10), (6, 3))
    z1, ld1 = xla.forward(params, x, c)
    z2, ld2 = fused.forward(params, x, c)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)
    x1, _ = xla.inverse(params, z1, c)
    x2, _ = fused.inverse(params, z2, c)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)


def test_fused_roundtrip():
    _, fused = _pair(12, c_internal=(128,))
    params = fused.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (5, 12))
    z, ld = fused.forward(params, x)
    x2, ld_inv = fused.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-5)


def test_fused_gradients_match():
    """custom_vjp backward (levelwise XLA remat) must equal the XLA grads."""
    xla, fused = _pair(8, c_internal=(128,))
    params = xla.init(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (6, 8))

    def nll(bij):
        def f(p):
            z, ld = bij.forward(p, x)
            return 0.5 * jnp.sum(z**2, axis=1).mean() - ld.mean()

        return f

    g1 = jax.grad(nll(xla))(params)
    g2 = jax.grad(nll(fused))(params)
    for l1, l2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_fused_ragged_batch_tile():
    """Batch without a nice divisor: kernel pads loads / masks stores."""
    from hint_tpu.ops.pallas_block import _run_fused

    xla, fused = _pair(10, c_internal=(32,))
    params = xla.init(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (37, 10))
    z1, ld1 = xla.forward(params, x)
    z2, ld2 = _run_fused(fused, params, x, None, rev=False, tile_b=16)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)


def test_fused_reshuffle_falls_back():
    """reshuffle blocks aren't fused; impl='fused' must still be correct."""
    xla, fused = _pair(8, c_internal=(32,), reshuffle=True)
    params = xla.init(jax.random.PRNGKey(13))
    x = jax.random.normal(jax.random.PRNGKey(14), (5, 8))
    z1, ld1 = xla.forward(params, x)
    z2, ld2 = fused.forward(params, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-6)
