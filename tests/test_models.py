"""Flow / TwoLaneFlow / builder tests: round-trips, per-lane logdets, and the
five model families of the reference config zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hint_tpu.models import builders
from hint_tpu.models.flow import Flow, TwoLaneFlow
from hint_tpu.train.optim import init_trainables

KEY = jax.random.PRNGKey(0)


def small_init(model, scale=0.05):
    """Initialize like training does (init_scale overwrite,
    train_unconditional.py:165-167). At torch-default init a deep HAC chain
    amplifies activations by e(s)^depth ≈ 54^16 — mathematically invertible
    but meaningless in fp32; no training regime ever visits it."""
    params = model.init(KEY)
    return init_trainables(params, model.trainable_mask(params), jax.random.PRNGKey(99), scale)


def roundtrip_flow(model, x, cond=None, tol=1e-4):
    params = small_init(model)
    z, ld = model.forward(params, x, cond)
    x2, ld_inv = model.inverse(params, z, cond)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=tol, rtol=0)
    return params, z, ld


def test_inn_builder_roundtrip():
    m = builders.inn(dim=20, n_blocks=4, hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 20))
    roundtrip_flow(m, x)
    # structure: perm before every block (unconditional_inn_4.py:60-69)
    assert len(m.bijectors) == 8


def test_hint_builder_roundtrip():
    m = builders.hint(dim=20, n_blocks=4, c_internal=(32, 16, 8, 4), perm_fixed=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 20))
    roundtrip_flow(m, x)
    # perm only between blocks (unconditional_hint_4_full.py:60-65)
    assert len(m.bijectors) == 4 + 3


def test_cinn_builder_roundtrip():
    m = builders.cinn(dim=20, cond_dim=4, n_blocks=4, hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 20))
    y = jax.random.normal(jax.random.PRNGKey(4), (8, 4))
    roundtrip_flow(m, x, y)


def test_recursive_cinn_builder_roundtrip():
    m = builders.recursive_cinn(dim=20, cond_dim=4, n_blocks=2, c_internal=(32, 16, 8))
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 20))
    y = jax.random.normal(jax.random.PRNGKey(6), (8, 4))
    roundtrip_flow(m, x, y)


def test_conditional_hint_two_lane():
    m = builders.conditional_hint(
        dim_x=20, dim_y=4, n_blocks=3, c_internal=(32, 16, 8), hidden_external=32, hidden_y=16
    )
    params = small_init(m)
    y = jax.random.normal(jax.random.PRNGKey(7), (8, 4))
    x = jax.random.normal(jax.random.PRNGKey(8), (8, 20))
    z_y, z_x, ld_y, ld_x = m.forward(params, y, x)
    assert z_y.shape == y.shape and z_x.shape == x.shape
    y2, x2, ldi_y, ldi_x = m.inverse(params, z_y, z_x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldi_y), -np.asarray(ld_y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ldi_x), -np.asarray(ld_x), atol=1e-4)


def test_two_lane_logdet_decomposition():
    """Full-z loss decomposes into per-lane parts (train_conditional.py:79-86):
    the total logdet equals the sum of lane logdets, and the y-lane logdet is
    independent of x (conditional structure of the HINT factorization)."""
    m = builders.conditional_hint(
        dim_x=12, dim_y=4, n_blocks=2, c_internal=(16, 8), hidden_external=16, hidden_y=8
    )
    params = small_init(m)
    y = jax.random.normal(jax.random.PRNGKey(9), (6, 4))
    x1 = jax.random.normal(jax.random.PRNGKey(10), (6, 12))
    x2 = jax.random.normal(jax.random.PRNGKey(11), (6, 12))
    z_y1, _, ld_y1, _ = m.forward(params, y, x1)
    z_y2, _, ld_y2, _ = m.forward(params, y, x2)
    # y-lane unaffected by x
    np.testing.assert_allclose(np.asarray(z_y1), np.asarray(z_y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_y1), np.asarray(ld_y2), atol=1e-6)


def test_conditional_hint_sampling_semantics():
    """model_inverse semantics (conditional_hint_8_full.py:99-113): push
    (y, random x) forward for z_y, then invert [z_y, z_x*]."""
    m = builders.conditional_hint(
        dim_x=12, dim_y=4, n_blocks=2, c_internal=(16, 8), hidden_external=16, hidden_y=8
    )
    params = small_init(m)
    y = jax.random.normal(jax.random.PRNGKey(12), (5, 4))
    z_rand = jax.random.normal(jax.random.PRNGKey(13), (5, 12))
    z_y, _, _, _ = m.forward(params, y, z_rand)
    test_z = jax.random.normal(jax.random.PRNGKey(14), (5, 12))
    y_rec, x_sample, _, _ = m.inverse(params, z_y, test_z)
    # inverting z_y reproduces y exactly
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)
    assert x_sample.shape == (5, 12)


def test_flow_jit_compiles_once():
    m = builders.hint(dim=10, n_blocks=2, c_internal=(16, 8))
    params = m.init(KEY)
    fwd = jax.jit(m.forward)
    x = jax.random.normal(jax.random.PRNGKey(15), (4, 10))
    z1, _ = fwd(params, x)
    z2, _ = fwd(params, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


def test_scanned_repeat_matches_unrolled():
    """lax.scan over stacked block params == trace-time unrolled chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hint_tpu.models import builders

    dim, n_blocks = 8, 3
    scanned = builders.hint(dim, n_blocks, (12, 8), perm_fixed=True, scan_blocks=True)
    unrolled = builders.hint(dim, n_blocks, (12, 8), perm_fixed=True, scan_blocks=False)

    p_scan = small_init(scanned)  # O(1) activations keep 1e-5 comparable
    # unstack the scanned params into the unrolled op layout:
    # unrolled ops: [hac, perm, hac, perm, hac, perm, hac]
    rep = p_scan["b1"]  # {b0: perm params, b1: hac params} stacked over n-1
    p_unroll = {"b0": p_scan["b0"]}
    for r in range(n_blocks - 1):
        p_unroll[f"b{2*r+1}"] = jax.tree.map(lambda a: a[r], rep["b0"])
        p_unroll[f"b{2*r+2}"] = jax.tree.map(lambda a: a[r], rep["b1"])

    x = jax.random.normal(jax.random.PRNGKey(1), (6, dim))
    z1, ld1 = scanned.forward(p_scan, x)
    z2, ld2 = unrolled.forward(p_unroll, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)

    x1, ldi1 = scanned.inverse(p_scan, z1)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldi1), -np.asarray(ld1), atol=1e-5)

    # masks: fixed perm Q frozen inside the scan stack too
    mask = scanned.trainable_mask(p_scan)
    assert mask["b1"]["b0"] == {"q_fixed": False}
