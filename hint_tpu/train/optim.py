"""Optimizer with torch-parity semantics (SURVEY.md §7 "hard parts").

Reproduces the reference update rule exactly
(/root/reference/train_unconditional.py:137-144,165-178,191-193):

1. per-element gradient clamp to ±5.0 *before* the optimizer
   (train_unconditional.py:140-141);
2. coupled L2 weight decay: ``wd * θ`` added to the (clamped) gradient
   *before* Adam's moment accumulation — torch ``Adam(weight_decay=...)``
   semantics, not AdamW;
3. Adam with betas from config and ``eps = 1e-4`` added after the sqrt,
   bias-corrected (train_unconditional.py:174-176);
4. LR schedule: ``lr(e) = lr_init * 3e-2`` for warmup epochs
   ``e < pre_low_lr``; afterwards the reference's behavior depends on the
   torch version it runs under, so BOTH semantics are implemented behind
   ``semantics=`` and tested against real ``torch.optim.lr_scheduler.StepLR``
   (tests/test_train.py):

   * ``"legacy"`` (default): ``lr_init * γ^e`` with γ = final_decay^(1/n_epochs)
     — torch-1.x StepLR recomputed lr from ``base_lr`` each step, so the
     warmup mutation (train_unconditional.py:191-193) was overwritten by the
     closed form. This is the schedule the reference was written against
     (repo dates to the torch-1.x era) and the one whose final lr actually
     reaches ``lr_init * final_decay``.
   * ``"modern"``: what the reference executes under torch ≥ 1.4 chainable
     schedulers today — ``StepLR.step()`` multiplies the *current* (warmup-
     mutated) lr, so post-warmup lr continues from the warmup value:
     ``lr_init * 3e-2 * γ^(e - pre_low_lr + 1)`` (≈28× lower; measured in
     round-1 VERDICT). With ``pre_low_lr == 0`` no mutation ever happens and
     both semantics coincide at ``lr_init * γ^e``.
5. init: every *trainable* leaf overwritten with ``init_scale * N(0,1)``
   (train_unconditional.py:165-167); frozen buffers (fixed Householder Q)
   keep their init values.

Updates are masked by the model's trainable mask so frozen buffers never
move (the functional analogue of ``params_trainable`` filtering).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Any

GRAD_CLAMP = 5.0  # train_unconditional.py:141
ADAM_EPS = 1e-4  # train_unconditional.py:175
WARMUP_FACTOR = 3e-2  # train_unconditional.py:193


LR_SEMANTICS = ("legacy", "modern")


def lr_schedule(
    epoch,
    lr_init: float,
    pre_low_lr: int,
    final_decay: float,
    n_epochs: int,
    semantics: str = "legacy",
):
    """Per-epoch learning rate (works traced or untraced). See module
    docstring for the legacy/modern StepLR distinction."""
    if semantics not in LR_SEMANTICS:
        raise ValueError(f"semantics must be one of {LR_SEMANTICS}, got {semantics!r}")
    e = jnp.asarray(epoch, jnp.float32)
    if semantics == "legacy" or pre_low_lr == 0:
        decayed = lr_init * jnp.power(final_decay, e / n_epochs)
    else:
        decayed = (
            lr_init
            * WARMUP_FACTOR
            * jnp.power(final_decay, (e - pre_low_lr + 1) / n_epochs)
        )
    return jnp.where(jnp.asarray(epoch) < pre_low_lr, lr_init * WARMUP_FACTOR, decayed)


def init_trainables(params: Params, mask: Params, key, init_scale: float) -> Params:
    """Overwrite trainable leaves with init_scale * N(0,1); keep frozen ones."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    mask_leaves = jax.tree.leaves(mask)
    assert len(mask_leaves) == len(leaves)
    new = [
        init_scale * jax.random.normal(k, p.shape, p.dtype) if m else p
        for p, m, k in zip(leaves, mask_leaves, keys)
    ]
    return jax.tree.unflatten(treedef, new)


class AdamState(NamedTuple):
    step: jax.Array
    mu: Params
    nu: Params


def make_optimizer(
    betas: Tuple[float, float],
    weight_decay: float,
    mask: Params,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, update_fn).

    update_fn(grads, state, params, lr) -> (updates, new_state); updates are
    to be *added* to params. The learning rate is a traced argument so one
    compiled step serves the whole schedule.
    """
    b1, b2 = betas

    def init_fn(params: Params) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(step=jnp.zeros([], jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads: Params, state: AdamState, params: Params, lr) -> Tuple[Params, AdamState]:
        # 1. elementwise clamp
        g = jax.tree.map(lambda t: jnp.clip(t, -GRAD_CLAMP, GRAD_CLAMP), grads)
        # 2. coupled L2 into the gradient
        if weight_decay:
            g = jax.tree.map(lambda t, p: t + weight_decay * p, g, params)
        # 3. Adam moments + bias correction, eps outside the sqrt
        step = state.step + 1
        mu = jax.tree.map(lambda m, t: b1 * m + (1 - b1) * t, state.mu, g)
        nu = jax.tree.map(lambda v, t: b2 * v + (1 - b2) * t * t, state.nu, g)
        bc1 = 1 - b1 ** step.astype(jnp.float32)
        bc2 = 1 - b2 ** step.astype(jnp.float32)
        updates = jax.tree.map(
            lambda m, v: -lr * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS), mu, nu
        )
        # 4. freeze non-trainables
        updates = jax.tree.map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask, is_leaf=lambda x: x is None
        )
        return updates, AdamState(step=step, mu=mu, nu=nu)

    return init_fn, update_fn


def apply_updates(params: Params, updates: Params) -> Params:
    return jax.tree.map(lambda p, u: p + u, params, updates)


# optax is available in the image; expose an equivalent chain for users who
# prefer the optax idiom (identical math, verified in tests/test_train.py).
def optax_equivalent(lr: float, betas: Tuple[float, float], weight_decay: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip(GRAD_CLAMP),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=ADAM_EPS),
        optax.scale(-lr),
    )
