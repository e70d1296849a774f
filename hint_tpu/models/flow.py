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


def with_remat(model):
    """Return a copy of the model with activation rematerialization enabled
    everywhere (incl. inner ScannedRepeat scan bodies). Math-identical; cuts
    the train step's HBM traffic, which the profile shows is the binding
    constraint (artifacts/profile_cost.json)."""
    if isinstance(model, Flow):
        bij = tuple(
            dataclasses.replace(b, remat=True) if isinstance(b, ScannedRepeat) else b
            for b in model.bijectors
        )
        return dataclasses.replace(model, remat=True, bijectors=bij)
    if isinstance(model, TwoLaneFlow):
        return dataclasses.replace(model, remat=True)
    return model


def _remat_forward(b):
    """Per-bijector jax.checkpoint wrapper: backward recomputes the block's
    activations from its (tiny) input instead of storing every hidden — the
    flagship train step is HBM-bound on exactly that traffic
    (artifacts/profile_cost.json: 27 GB accessed/step, 61% HBM util, 2.6%
    MXU), so trading FLOPs for bytes is the right direction on TPU."""
    return jax.checkpoint(lambda p, x, c: b.forward(p, x, c))


@dataclasses.dataclass(frozen=True)
class Flow:
    """Invertible chain. ``cond_dim > 0`` threads one condition to every op
    that declares a ``cond_dim``. ``remat=True`` checkpoints each bijector's
    forward (gradients recompute activations; identical math)."""

    bijectors: Tuple[Bijector, ...]
    dim: int
    cond_dim: int = 0
    remat: bool = False

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
            if self.remat:
                x, j = _remat_forward(b)(params[_op_key(i)], x, c)
            else:
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
class ScannedRepeat:
    """n identical bijector units executed with ``lax.scan`` over stacked
    params.

    The reference's deep configs repeat one block pattern up to 32 times
    (e.g. configs/plus_shape/unconditional_hint_32_0_big.py); unrolling
    them at trace time makes XLA compile the same subgraph 32 times. This
    wrapper traces the unit once and scans, so compile time is O(1) in
    depth while the math is identical (verified in tests against the
    unrolled chain). Opt-in via the builders' ``scan_blocks=True``.

    ``unit`` is a tuple of bijectors applied in order (e.g. (perm, hac));
    all repeats share the unit's static structure, params are stacked along
    a leading axis.
    """

    unit: Tuple[Bijector, ...]
    n: int
    dim: int = 0
    cond_dim: int = 0
    remat: bool = False  # checkpoint the scan body (see _remat_forward)

    def init(self, key: Array) -> Params:
        keys = jax.random.split(key, self.n)

        def one(k):
            ks = jax.random.split(k, max(len(self.unit), 1))
            return {_op_key(i): b.init(ks[i]) for i, b in enumerate(self.unit)}

        per_repeat = [one(k) for k in keys]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_repeat)

    def trainable_mask(self, params: Params) -> Params:
        return {
            _op_key(i): b.trainable_mask(
                jax.tree.map(lambda a: a[0], params[_op_key(i)])
            )
            for i, b in enumerate(self.unit)
        }

    def _apply(self, params: Params, x: Array, cond: Optional[Array], rev: bool):
        def body(carry, p):
            h, ld = carry
            idx = range(len(self.unit)) if not rev else reversed(range(len(self.unit)))
            for i in idx:
                b = self.unit[i]
                c = cond if b.cond_dim > 0 else None
                fn = b.inverse if rev else b.forward
                h, j = fn(p[_op_key(i)], h, c)
                ld = ld + j
            return (h, ld), None

        ld0 = jnp.zeros(x.shape[:1], dtype=x.dtype)
        scan_params = params if not rev else jax.tree.map(lambda a: a[::-1], params)
        fn = jax.checkpoint(body) if self.remat else body
        (x, ld), _ = jax.lax.scan(fn, (x, ld0), scan_params)
        return x, ld

    def forward(self, params: Params, x: Array, cond: Optional[Array] = None):
        return self._apply(params, x, cond, rev=False)

    def inverse(self, params: Params, z: Array, cond: Optional[Array] = None):
        return self._apply(params, z, cond, rev=True)

    @property
    def n_params(self) -> int:
        return self.n * sum(getattr(b, "n_params", 0) for b in self.unit)


# -- scanned <-> unrolled layout conversion -------------------------------------
#
# A ScannedRepeat holds its params stacked along a leading repeat axis; the
# equivalent unrolled chain holds one entry per op. These helpers convert any
# param-shaped tree (params, Adam mu/nu) between the two layouts so that
#
# * initialization is ALWAYS performed in the unrolled layout (Trainer
#   draws keys per unrolled op), making scanned and unrolled builds of the
#   same config start from bit-identical weights, and
# * checkpoints are ALWAYS saved in the unrolled layout (train/checkpoint.py),
#   so a file written by either build loads into either build.


def unrolled_view(model):
    """The equivalent trace-time-unrolled model (identity if nothing is
    scanned). For a Flow, every ScannedRepeat is expanded into its unit ops
    repeated n times — exactly the chain the builders construct with
    ``scan_blocks=False``."""
    if isinstance(model, Flow) and any(
        isinstance(b, ScannedRepeat) for b in model.bijectors
    ):
        ops = []
        for b in model.bijectors:
            if isinstance(b, ScannedRepeat):
                ops.extend(b.unit * b.n)
            else:
                ops.append(b)
        return dataclasses.replace(model, bijectors=tuple(ops))
    return model


def to_unrolled_tree(model, tree: Params) -> Params:
    """Convert a param-shaped tree from ``model``'s (possibly scanned) layout
    to the unrolled layout. Identity (same object) if nothing is scanned."""
    if not (
        isinstance(model, Flow)
        and any(isinstance(b, ScannedRepeat) for b in model.bijectors)
    ):
        return tree
    out, j = {}, 0
    for i, b in enumerate(model.bijectors):
        p = tree[_op_key(i)]
        if isinstance(b, ScannedRepeat):
            u = len(b.unit)
            for k in range(b.n):
                for ii in range(u):
                    out[_op_key(j + k * u + ii)] = jax.tree.map(
                        lambda a, k=k: a[k], p[_op_key(ii)]
                    )
            j += b.n * u
        else:
            out[_op_key(j)] = p
            j += 1
    return out


def to_stacked_tree(model, unrolled: Params) -> Params:
    """Inverse of :func:`to_unrolled_tree`: restack an unrolled-layout tree
    into ``model``'s scanned layout. Identity (same object) if nothing is
    scanned."""
    if not (
        isinstance(model, Flow)
        and any(isinstance(b, ScannedRepeat) for b in model.bijectors)
    ):
        return unrolled
    out, j = {}, 0
    for i, b in enumerate(model.bijectors):
        if isinstance(b, ScannedRepeat):
            u = len(b.unit)
            per_repeat = [
                {
                    _op_key(ii): unrolled[_op_key(j + k * u + ii)]
                    for ii in range(u)
                }
                for k in range(b.n)
            ]
            out[_op_key(i)] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_repeat)
            j += b.n * u
        else:
            out[_op_key(i)] = unrolled[_op_key(j)]
            j += 1
    return out


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
    remat: bool = False

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
            fwd = _remat_forward(b) if self.remat else (lambda p, h, c, b=b: b.forward(p, h, c))
            if lane == LANE_Y:
                y, j = fwd(p, y, None)
                ld_y = ld_y + j
            elif lane == LANE_X:
                x, j = fwd(p, x, None)
                ld_x = ld_x + j
            elif lane == LANE_YX:
                x, j = fwd(p, x, y)
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
