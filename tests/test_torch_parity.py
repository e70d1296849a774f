"""Cross-framework parity: hint_tpu vs an independent PyTorch implementation.

BASELINE.md demands forward/inverse + log-det agreement with the (PyTorch)
reference at 1e-5. FrEIA is not installed here, so the oracle is a small
torch implementation of the same mathematical spec written directly from
the recursion (split at d//2, s/t MLPs on the upper half, soft clamp
e(s)=exp(4*0.636*atan(s)), couple-then-recurse on inverse — the semantics
documented at /root/reference/hint.py:21-101). hint_tpu weights are
injected into the torch modules, so any disagreement is a framework bug,
not initialization noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hint_tpu.ops.hac import HierarchicalAffineCoupling
from hint_tpu.ops.coupling import AffineCoupling

CLAMP_C = 4.0 * 0.636


def _torch_mlp(node_params):
    """3-layer ReLU MLP from hint_tpu weight dict (w: (in,out) layout)."""
    import torch.nn as nn

    w0, b0 = node_params["w0"], node_params["b0"]
    w1, b1 = node_params["w1"], node_params["b1"]
    w2, b2 = node_params["w2"], node_params["b2"]
    m = nn.Sequential(
        nn.Linear(w0.shape[0], w0.shape[1]), nn.ReLU(),
        nn.Linear(w1.shape[0], w1.shape[1]), nn.ReLU(),
        nn.Linear(w2.shape[0], w2.shape[1]),
    )
    with torch.no_grad():
        for layer, (w, b) in zip((m[0], m[2], m[4]), ((w0, b0), (w1, b1), (w2, b2))):
            layer.weight.copy_(torch.tensor(np.asarray(w).T))
            layer.bias.copy_(torch.tensor(np.asarray(b)))
    return m


def _torch_hac_forward(bij, params, node, x):
    """Recursive forward (recurse-then-couple, hint.py:70-83)."""
    xu, xl = x[:, : node.split], x[:, node.split :]
    j = x.new_zeros(x.shape[0])
    if not node.leaf:
        xu, ju = _torch_hac_forward(bij, params, node.upper, xu)
        xl, jl = _torch_hac_forward(bij, params, node.lower, xl)
        j = ju + jl
    s_net = _torch_mlp(bij._node_subnet(params, node, 0))
    t_net = _torch_mlp(bij._node_subnet(params, node, 1))
    s = s_net(xu)
    log_e = CLAMP_C * torch.atan(s)
    xl = torch.exp(log_e) * xl + t_net(xu)
    return torch.cat([xu, xl], dim=1), j + log_e.sum(dim=1)


def _torch_hac_inverse(bij, params, node, y):
    """Couple-then-recurse (hint.py:85-88)."""
    yu, yl = y[:, : node.split], y[:, node.split :]
    s_net = _torch_mlp(bij._node_subnet(params, node, 0))
    t_net = _torch_mlp(bij._node_subnet(params, node, 1))
    s = s_net(yu)
    log_e = CLAMP_C * torch.atan(s)
    yl = (yl - t_net(yu)) / torch.exp(log_e)
    j = -log_e.sum(dim=1)
    if not node.leaf:
        yu, ju = _torch_hac_inverse(bij, params, node.upper, yu)
        yl, jl = _torch_hac_inverse(bij, params, node.lower, yl)
        j = j + ju + jl
    return torch.cat([yu, yl], dim=1), j


@pytest.mark.parametrize("dim", [7, 20])
def test_hac_forward_matches_torch(dim):
    bij = HierarchicalAffineCoupling(dim=dim, c_internal=(16, 8))
    params = bij.init(jax.random.PRNGKey(0))
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (6, dim)), np.float32)

    z_jax, ld_jax = bij.forward(params, jnp.asarray(x))
    with torch.no_grad():
        z_t, ld_t = _torch_hac_forward(bij, params, bij.tree, torch.tensor(x))
    np.testing.assert_allclose(np.asarray(z_jax), z_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_jax), ld_t.numpy(), atol=1e-5)


def test_hac_inverse_matches_torch():
    dim = 12
    bij = HierarchicalAffineCoupling(dim=dim, c_internal=(16, 8))
    params = bij.init(jax.random.PRNGKey(2))
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (5, dim)), np.float32)

    x_jax, ld_jax = bij.inverse(params, jnp.asarray(z))
    with torch.no_grad():
        x_t, ld_t = _torch_hac_inverse(bij, params, bij.tree, torch.tensor(z))
    np.testing.assert_allclose(np.asarray(x_jax), x_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_jax), ld_t.numpy(), atol=1e-5)


def test_affine_coupling_matches_torch():
    dim = 10
    bij = AffineCoupling(dim=dim, hidden=16)
    params = bij.init(jax.random.PRNGKey(4))
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (6, dim)), np.float32)

    z_jax, ld_jax = bij.forward(params, jnp.asarray(x))

    s1, s2 = dim // 2, dim - dim // 2
    f1 = _torch_mlp(params["f1"])
    f2 = _torch_mlp(params["f2"])
    xt = torch.tensor(x)
    with torch.no_grad():
        x1, x2 = xt[:, :s1], xt[:, s1:]
        a = f1(x1)
        sA, tA = a[:, :s2], a[:, s2:]
        logeA = CLAMP_C * torch.atan(sA)
        y2 = torch.exp(logeA) * x2 + tA
        b = f2(y2)
        sB, tB = b[:, :s1], b[:, s1:]
        logeB = CLAMP_C * torch.atan(sB)
        y1 = torch.exp(logeB) * x1 + tB
        z_t = torch.cat([y1, y2], dim=1)
        ld_t = logeA.sum(1) + logeB.sum(1)
    np.testing.assert_allclose(np.asarray(z_jax), z_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_jax), ld_t.numpy(), atol=1e-5)
