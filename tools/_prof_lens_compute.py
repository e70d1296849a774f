#!/usr/bin/env python
"""Throwaway: compute-only stage timing (scalar outputs, no bulk D2H)."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.data import lens_tpu as L

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
key = jax.random.PRNGKey(0)
k_r, k_t, k_shift, _ = jax.random.split(key, 4)
r0 = 1.0 + jax.random.uniform(k_r, (B,), jnp.float32)
theta = 2.0 * jnp.pi * jax.random.uniform(k_t, (B,), jnp.float32)
shift = jax.random.normal(k_shift, (B, 2), jnp.float32)


@jax.jit
def c_rings(r0, theta):
    px, py, k = L._lens_rings_xy(r0, theta)
    return px.sum() + py.sum() + k.sum()


@jax.jit
def c_through_x(r0, theta, shift):
    px, py, k = L._lens_rings_xy(r0, theta)
    x = L._ring_to_x_xy(px, py, k, shift)
    return x.sum()


@jax.jit
def c_full(key):
    out = L._chunk_kernel.__wrapped__(key, B)
    return jnp.sum(out[0])


@jax.jit
def c_screen_only(x):
    feats, band, seam, i1 = L._forward_screen(x)
    return feats.sum() + band.sum() + seam.sum() + i1.sum()


def timeit(name, fn, *a, reps=5):
    _ = np.asarray(fn(*a))
    t0 = time.time()
    for _i in range(reps):
        _ = np.asarray(fn(*a))
    dt = (time.time() - t0) / reps
    print(f"{name:16s} {dt*1000:9.1f} ms  ({B/dt:,.0f} rows/s)")


timeit("rings", c_rings, r0, theta)
timeit("rings+x", c_through_x, r0, theta, shift)
x = c_through_x(r0, theta, shift)  # warm
xfull = jax.jit(lambda r0, theta, shift: L._ring_to_x_xy(*L._lens_rings_xy(r0, theta), shift))(r0, theta, shift)
timeit("screen", c_screen_only, xfull)
timeit("full", c_full, key)
