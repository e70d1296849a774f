"""Householder permutation (orthogonal, volume-preserving bijector).

Capability parity with FrEIA's ``HouseholderPerm`` as used by the reference
(/root/reference/configs/plus_shape/unconditional_inn_4.py:62-64 for fixed,
/root/reference/configs/plus_shape/unconditional_hint_4_3.py:63-65 for
trainable, /root/reference/hint.py:37 for the in-tree conditional reshuffle)
— re-designed for TPU:

* The orthogonal map ``Q = H_1 H_2 ... H_n`` (each ``H_i = I - 2 v_i v_i^T /
  (v_i^T v_i)``) is materialized as a *single matrix* so application is one
  MXU matmul, not ``n`` sequential rank-1 updates.
* ``Q`` is built by a log-depth pairwise tree product of the reflection
  matrices — O(log n) sequential matmul stages instead of O(n).
* ``fixed=True``: the reflection vectors are a frozen, deterministically
  seeded buffer and ``Q`` is precomputed once at ``init`` (stored in params,
  excluded from the trainable mask so checkpoints reproduce the same map —
  SURVEY.md §7 "HouseholderPerm fidelity").
* ``fixed=False``: reflection vectors are trainable; ``Q`` is rebuilt each
  step (cheap: n·d^3 ≤ 1e8 flops at d ≤ 104).
* conditional (``cond_dim > 0``): per-sample reflection vectors come from a
  linear map of the condition; reflections are applied sequentially as
  vector ops via ``lax.scan`` (a per-sample d×d ``Q`` would be wasteful).
  This path exists for parity with ``HouseholderPerm(dims_c=...)`` inside a
  conditional reshuffled HAC tree (hint.py:37) — never exercised by any stock
  reference config.

Convention: row-vector action, ``forward: y = x @ Q``; ``inverse: x = y @
Q^T``. log|det J| = 0 exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hint_tpu.ops.base import Array, Bijector, Params


def householder_matrix_product(vs: Array) -> Array:
    """Q = H_1 @ H_2 @ ... @ H_n via log-depth pairwise tree reduction.

    vs: (n_reflections, d). Returns (d, d) orthogonal Q.
    """
    n, d = vs.shape
    vn = vs / jnp.linalg.norm(vs, axis=-1, keepdims=True)
    hs = jnp.eye(d, dtype=vs.dtype)[None, :, :] - 2.0 * jnp.einsum("ni,nj->nij", vn, vn)
    prec = jax.lax.Precision.HIGHEST
    while hs.shape[0] > 1:
        m = hs.shape[0]
        if m % 2 == 1:
            tail = hs[-1:]
            hs = jnp.concatenate(
                [jnp.einsum("nij,njk->nik", hs[0 : m - 1 : 2], hs[1 : m - 1 : 2], precision=prec), tail], axis=0
            )
        else:
            hs = jnp.einsum("nij,njk->nik", hs[0::2], hs[1::2], precision=prec)
    return hs[0]


def _apply_reflections_seq(vs: Array, x: Array, reverse: bool) -> Array:
    """Apply reflections sequentially (per-sample vs: (B, n, d), x: (B, d))."""
    vs = vs / jnp.linalg.norm(vs, axis=-1, keepdims=True)
    order = jnp.arange(vs.shape[1])
    if reverse:
        order = order[::-1]

    def body(carry, i):
        v = vs[:, i, :]  # (B, d)
        proj = jnp.sum(carry * v, axis=-1, keepdims=True)
        return carry - 2.0 * proj * v, None

    out, _ = jax.lax.scan(body, x, order)
    return out


@dataclasses.dataclass(frozen=True)
class HouseholderPerm(Bijector):
    n_reflections: int = 1
    fixed: bool = True

    def __post_init__(self):
        if self.cond_dim > 0 and self.fixed:
            raise ValueError("conditional HouseholderPerm cannot be fixed")

    def init(self, key: Array) -> Params:
        if self.cond_dim > 0:
            # Linear map cond -> reflection vectors (trainable).
            k1, k2 = jax.random.split(key)
            scale = 1.0 / jnp.sqrt(jnp.float32(self.cond_dim))
            return {
                "w_cond": scale * jax.random.normal(
                    k1, (self.cond_dim, self.n_reflections * self.dim), jnp.float32
                ),
                "b_cond": jax.random.normal(k2, (self.n_reflections * self.dim,), jnp.float32),
            }
        vs = jax.random.normal(key, (self.n_reflections, self.dim), jnp.float32)
        if self.fixed:
            # Precompute Q once; store as frozen buffer.
            return {"q_fixed": householder_matrix_product(vs)}
        return {"vs": vs}

    def trainable_mask(self, params: Params) -> Params:
        return {k: (k != "q_fixed") for k in params}

    def _q(self, params: Params) -> Array:
        if self.fixed:
            return params["q_fixed"]
        return householder_matrix_product(params["vs"])

    def _cond_vs(self, params: Params, cond: Array) -> Array:
        vs = cond @ params["w_cond"] + params["b_cond"]
        return vs.reshape(cond.shape[0], self.n_reflections, self.dim)

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        if self.cond_dim > 0:
            y = _apply_reflections_seq(self._cond_vs(params, cond), x, reverse=False)
        else:
            y = jnp.dot(x, self._q(params), precision=jax.lax.Precision.HIGHEST)
        return y, self._zeros_logdet(x)

    def inverse(self, params: Params, y: Array, cond: Optional[Array] = None):
        if self.cond_dim > 0:
            x = _apply_reflections_seq(self._cond_vs(params, cond), y, reverse=True)
        else:
            x = jnp.dot(y, self._q(params).T, precision=jax.lax.Precision.HIGHEST)
        return x, self._zeros_logdet(y)
