"""Pallas fused-level engine parity vs the XLA levelwise engine.

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
    b = dataclasses.replace(a, impl="pallas")
    return a, b


@pytest.mark.parametrize("dim,max_splits", [(6, -1), (11, -1), (20, 2)])
def test_pallas_matches_levelwise_forward(dim, max_splits):
    xla, pal = _pair(dim, c_internal=(128,), max_splits=max_splits)
    params = xla.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (9, dim))
    z1, ld1 = xla.forward(params, x)
    z2, ld2 = pal.forward(params, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)


def test_pallas_matches_levelwise_inverse():
    xla, pal = _pair(10, c_internal=(128,))
    params = xla.init(jax.random.PRNGKey(2))
    z = jax.random.normal(jax.random.PRNGKey(3), (7, 10))
    x1, ld1 = xla.inverse(params, z)
    x2, ld2 = pal.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)


def test_pallas_roundtrip():
    _, pal = _pair(12, c_internal=(128,))
    params = pal.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (5, 12))
    z, ld = pal.forward(params, x)
    x2, ld_inv = pal.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-5)


def test_pallas_gradients_match():
    """custom_vjp backward (XLA remat) must equal the XLA engine's grads."""
    xla, pal = _pair(8, c_internal=(128,))
    params = xla.init(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (6, 8))

    def nll(bij):
        def f(p):
            z, ld = bij.forward(p, x)
            return 0.5 * jnp.sum(z**2, axis=1).mean() - ld.mean()

        return f

    g1 = jax.grad(nll(xla))(params)
    g2 = jax.grad(nll(pal))(params)
    for l1, l2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_pallas_ragged_batch_tile():
    """Batch not a multiple of the tile: kernel pads loads / masks stores."""
    from hint_tpu.ops.pallas_hac import fused_level_mlp

    rng = np.random.default_rng(0)
    n2, B, d_in, h, d_out = 4, 37, 6, 8, 5
    xs = jnp.asarray(rng.standard_normal((n2, B, d_in)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((n2, d_in, h)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((n2, h)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((n2, h, h)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((n2, h)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((n2, h, d_out)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((n2, d_out)), jnp.float32)
    mask = jnp.ones((n2, 1, d_out), jnp.float32)
    out = fused_level_mlp(xs, w0, b0, w1, b1, w2, b2, mask, tile_b=16, interpret=True)

    from hint_tpu.ops.pallas_hac import _xla_reference

    ref = _xla_reference(xs, w0, b0, w1, b1, w2, b2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
