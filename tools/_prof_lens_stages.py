#!/usr/bin/env python
"""Throwaway: per-stage timing of the lens TPU chunk kernel."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.data import lens_tpu as L

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
key = jax.random.PRNGKey(0)
k_r, k_t, k_shift, k_noise = jax.random.split(key, 4)
r0 = 1.0 + jax.random.uniform(k_r, (B,), jnp.float32)
theta = 2.0 * jnp.pi * jax.random.uniform(k_t, (B,), jnp.float32)
shift = jax.random.normal(k_shift, (B, 2), jnp.float32)


@jax.jit
def stage_rings(r0, theta):
    return L._lens_rings(r0, theta)


@jax.jit
def stage_x(pts, valid, k, shift):
    return L._ring_to_x(pts, valid, k, shift)


@jax.jit
def stage_screen(x):
    return L._forward_screen(x)


@jax.jit
def stage_trace(x):
    return L._trace_xy(x)


def timeit(name, fn, *a, reps=5):
    out = fn(*a)
    flat = [x for x in jax.tree_util.tree_leaves(out)]
    _ = [np.asarray(x) for x in flat]  # sync (axon: block via transfer)
    t0 = time.time()
    for _i in range(reps):
        out = fn(*a)
        _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
    dt = (time.time() - t0) / reps
    print(f"{name:16s} {dt*1000:9.1f} ms  ({B/dt:,.0f} rows/s)")
    return out


pts, valid, k = timeit("lens_rings", stage_rings, r0, theta)
x = timeit("ring_to_x", stage_x, pts, valid, k, shift)
xt = timeit("trace", stage_trace, x)
_ = timeit("forward_screen", stage_screen, x)
_ = timeit("full_kernel", lambda: L._chunk_kernel(key, B))
