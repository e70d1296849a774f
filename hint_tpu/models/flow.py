"""Flow graphs: single-lane chains and the two-lane conditional HINT graph.

Replaces FrEIA's ``ReversibleGraphNet`` node DSL (usage at
/root/reference/configs/plus_shape/unconditional_hint_4_full.py:58-76) with
two static, trace-time-unrolled compositions:

* ``Flow`` — a chain of bijectors over one lane, optionally conditioned on an
  external vector (the cINN pattern,
  /root/reference/configs/plus_shape/conditional_cinn_4.py:58-73).
* ``TwoLaneFlow`` — the conditional-HINT graph: a y-lane and an x-lane with
  cross-lane couplings where the x-lane op is conditioned on the *current*
  y-lane state (/root/reference/configs/plus_shape/conditional_hint_8_full.py:58-96).
  Log-dets are tracked *per lane*, replacing the reference's fragile
  node-name-substring accounting (``x_jac``,
  /root/reference/train_conditional.py:50-55).

Params are ``{"b0": ..., "b1": ...}`` dicts keyed by op index.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hint_tpu.ops.base import Array, Bijector, Params

# lanes for TwoLaneFlow steps
LANE_Y = "y"  # bijector acts on the y lane
LANE_X = "x"  # bijector acts on the x lane (unconditioned)
LANE_YX = "y->x"  # bijector acts on the x lane, conditioned on current y state


def _op_key(i: int) -> str:
    return f"b{i}"


@dataclasses.dataclass(frozen=True)
class Flow:
    """Invertible chain. ``cond_dim > 0`` threads one condition to every op
    that declares a ``cond_dim``."""

    bijectors: Tuple[Bijector, ...]
    dim: int
    cond_dim: int = 0

    def init(self, key: Array) -> Params:
        keys = jax.random.split(key, max(len(self.bijectors), 1))
        return {_op_key(i): b.init(keys[i]) for i, b in enumerate(self.bijectors)}

    def trainable_mask(self, params: Params) -> Params:
        return {
            _op_key(i): b.trainable_mask(params[_op_key(i)])
            for i, b in enumerate(self.bijectors)
        }

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        logdet = jnp.zeros(x.shape[:1], dtype=x.dtype)
        for i, b in enumerate(self.bijectors):
            c = cond if b.cond_dim > 0 else None
            x, j = b.forward(params[_op_key(i)], x, c)
            logdet = logdet + j
        return x, logdet

    def inverse(self, params: Params, z: Array, cond: Optional[Array] = None):
        logdet = jnp.zeros(z.shape[:1], dtype=z.dtype)
        for i in reversed(range(len(self.bijectors))):
            b = self.bijectors[i]
            c = cond if b.cond_dim > 0 else None
            z, j = b.inverse(params[_op_key(i)], z, c)
            logdet = logdet + j
        return z, logdet

    @property
    def n_params_static(self) -> int:
        total = 0
        for b in self.bijectors:
            total += getattr(b, "n_params", 0)
        return total


@dataclasses.dataclass(frozen=True)
class TwoLaneFlow:
    """Conditional HINT: joint invertible map (y, x) <-> (z_y, z_x).

    ``steps`` is a linear sequence of (lane, bijector). Ops never move mass
    between lanes; ``LANE_YX`` ops read the current y-lane state as their
    condition, which is invertible because they do not modify y.
    """

    steps: Tuple[Tuple[str, Bijector], ...]
    dim_y: int
    dim_x: int

    def init(self, key: Array) -> Params:
        keys = jax.random.split(key, max(len(self.steps), 1))
        return {_op_key(i): b.init(keys[i]) for i, (_, b) in enumerate(self.steps)}

    def trainable_mask(self, params: Params) -> Params:
        return {
            _op_key(i): b.trainable_mask(params[_op_key(i)])
            for i, (_, b) in enumerate(self.steps)
        }

    def forward(self, params: Params, y: Array, x: Array):
        """Returns (z_y, z_x, logdet_y, logdet_x).

        ``logdet_x`` covers exactly the x-lane ops (``LANE_X`` +
        ``LANE_YX``) — the principled version of the reference's ``x_jac``
        name-matching (/root/reference/train_conditional.py:50-55).
        """
        ld_y = jnp.zeros(y.shape[:1], dtype=y.dtype)
        ld_x = jnp.zeros(x.shape[:1], dtype=x.dtype)
        for i, (lane, b) in enumerate(self.steps):
            p = params[_op_key(i)]
            if lane == LANE_Y:
                y, j = b.forward(p, y)
                ld_y = ld_y + j
            elif lane == LANE_X:
                x, j = b.forward(p, x)
                ld_x = ld_x + j
            elif lane == LANE_YX:
                x, j = b.forward(p, x, y)
                ld_x = ld_x + j
            else:
                raise ValueError(f"unknown lane {lane!r}")
        return y, x, ld_y, ld_x

    def inverse(self, params: Params, z_y: Array, z_x: Array):
        """Exact inverse; returns (y, x, logdet_y, logdet_x)."""
        ld_y = jnp.zeros(z_y.shape[:1], dtype=z_y.dtype)
        ld_x = jnp.zeros(z_x.shape[:1], dtype=z_x.dtype)
        for i in reversed(range(len(self.steps))):
            lane, b = self.steps[i]
            p = params[_op_key(i)]
            if lane == LANE_Y:
                z_y, j = b.inverse(p, z_y)
                ld_y = ld_y + j
            elif lane == LANE_X:
                z_x, j = b.inverse(p, z_x)
                ld_x = ld_x + j
            elif lane == LANE_YX:
                # y-lane state here equals its forward-time value: later y-ops
                # are already inverted and this op does not modify y.
                z_x, j = b.inverse(p, z_x, z_y)
                ld_x = ld_x + j
        return z_y, z_x, ld_y, ld_x
