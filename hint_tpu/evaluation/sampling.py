"""Model sampling — the ``model_inverse`` semantics of each config family.

Reference definitions (per-config closures over the global model):
* unconditional: ``model(z, rev=True)``
  (configs/plus_shape/unconditional_hint_4_full.py:79-80);
* cINN / recursive cINN: ``model([z], c=[y], rev=True)``
  (configs/plus_shape/conditional_cinn_4.py:80-82);
* two-lane conditional HINT: push (y, random x) forward for ``z_y``, then
  invert ``[z_y, z*]`` (configs/plus_shape/conditional_hint_8_full.py:99-102);
  plus ``sample_joint`` and ``sample_conditional`` (…:104-113).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hint_tpu.models.flow import Flow, TwoLaneFlow

# jitted inverse/sampler per (model, tag): models are frozen dataclasses, so
# equal configs share one compiled entry even across fresh instances (a
# campaign building a model per config/seed re-hits instead of leaking), and
# a size cap bounds the worst case
_JIT_CACHE = {}
_JIT_CACHE_MAX = 256


def _cached_jit(model, tag: str, fn):
    key = (model, tag)
    if key not in _JIT_CACHE:
        if len(_JIT_CACHE) >= _JIT_CACHE_MAX:
            _JIT_CACHE.clear()
        _JIT_CACHE[key] = jax.jit(fn)
    return _JIT_CACHE[key]


def sample_model(
    cfg, model, params, n: int, key: jax.Array, y_target=None, mesh=None
) -> jax.Array:
    """Draw n samples of x from the trained model (x-space).

    With ``mesh``, the latent batch is sharded over the mesh's data axis and
    the inverse pass runs data-parallel (sampling is embarrassingly parallel
    over rows; XLA partitions the jitted inverse along the input sharding).
    Results are bit-identical to the unsharded path — latents are drawn the
    same way and only then sharded.
    """
    k_z, k_x = jax.random.split(key)
    if isinstance(model, TwoLaneFlow):
        y = jnp.broadcast_to(jnp.asarray(y_target, jnp.float32)[None, :], (n, model.dim_y))
        return sample_conditional_hint(model, params, y, k_z, k_x, mesh=mesh)[:n]
    z = jax.random.normal(k_z, (n, model.dim))
    if cfg.is_conditional:
        y = jnp.broadcast_to(jnp.asarray(y_target, jnp.float32)[None, :], (n, len(y_target)))
        if mesh is not None:
            z, y = _shard_pair(mesh, z, y)
        f = _cached_jit(model, "inv_cond", lambda p, z, y: model.inverse(p, z, y)[0])
        return f(params, z, y)[:n]
    if mesh is not None:
        z, _ = _shard_rows(mesh, z)
    f = _cached_jit(model, "inv", lambda p, z: model.inverse(p, z)[0])
    return f(params, z)[:n]


def _shard_rows(mesh, a):
    from hint_tpu.parallel import pad_rows, shard_batch

    a, n = pad_rows(a, mesh.shape["data"])
    return shard_batch(a, mesh), n


def _shard_pair(mesh, a, b):
    a, _ = _shard_rows(mesh, a)
    b, _ = _shard_rows(mesh, b)
    return a, b


def sample_conditional_hint(
    model: TwoLaneFlow, params, y: jax.Array, key_z: jax.Array, key_x: jax.Array,
    mesh=None,
) -> jax.Array:
    """model_inverse (conditional_hint_8_full.py:99-102)."""
    x_rand = jax.random.normal(key_x, (y.shape[0], model.dim_x))
    test_z = jax.random.normal(key_z, (y.shape[0], model.dim_x))
    if mesh is not None:
        y, _ = _shard_rows(mesh, y)
        x_rand, _ = _shard_rows(mesh, x_rand)
        test_z, _ = _shard_rows(mesh, test_z)

    def f(p, y, x_rand, test_z):
        z_y, _, _, _ = model.forward(p, y, x_rand)
        _, x, _, _ = model.inverse(p, z_y, test_z)
        return x

    return _cached_jit(model, "cond_hint_sample", f)(params, y, x_rand, test_z)


def sample_joint_hint(model: TwoLaneFlow, params, n: int, key: jax.Array):
    """sample_joint (conditional_hint_8_full.py:104-106)."""
    k_y, k_x = jax.random.split(key)
    z_y = jax.random.normal(k_y, (n, model.dim_y))
    z_x = jax.random.normal(k_x, (n, model.dim_x))
    y, x, _, _ = model.inverse(params, z_y, z_x)
    return y, x


def sample_conditional(
    model: TwoLaneFlow, params, y: jax.Array, key: jax.Array, z_x: Optional[jax.Array] = None
):
    """sample_conditional (conditional_hint_8_full.py:108-113)."""
    if z_x is None:
        z_x = jax.random.normal(key, (y.shape[0], model.dim_x))
    z_y, _, _, _ = model.forward(params, y, z_x)
    _, x, _, _ = model.inverse(params, z_y, z_x)
    return x
