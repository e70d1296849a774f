"""On-chip validation + interleaved timing of the fused dense-level kernel.

Run on the real TPU. Produces artifacts/fused_onchip.json: compile wall,
max |fwd - levelwise fwd|, logdet diff, and interleaved fwd/inv medians for
levelwise vs fused at f32 and bf16 (batch 10000, flagship).
"""
import dataclasses
import json
import statistics
import time

import jax
import jax.numpy as jnp

from hint_tpu.configs import get_config
from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)

NAME = "plus_shape.unconditional_hint_4_full"
B = 10000
out = {"batch": B}


def timeit(fn, n=10):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


variants = {}
for dtype in ("float32", "bfloat16"):
    for impl in ("levelwise", "fused"):
        cfg = get_config(NAME)
        tr = cfg.make_trainer(compute_dtype=dtype, impl=impl)
        model = tr.model
        state = tr.init_state(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.ndim_x), jnp.float32)
        fwd = jax.jit(lambda p, xx, model=model: model.forward(p, xx))
        inv = jax.jit(lambda p, zz, model=model: model.inverse(p, zz))
        t0 = time.time()
        z, ld = fwd(state.params, x)
        jax.block_until_ready(z)
        compile_fwd = time.time() - t0
        t0 = time.time()
        xr, ldr = inv(state.params, x)
        jax.block_until_ready(xr)
        compile_inv = time.time() - t0
        tag = f"{impl}-{dtype}"
        variants[tag] = (fwd, inv, state.params, x)
        out[tag] = {"compile_fwd_s": compile_fwd, "compile_inv_s": compile_inv}
        print(f"{tag}: compiled fwd {compile_fwd:.1f}s inv {compile_inv:.1f}s", flush=True)

# parity on-chip (f32)
fwd_l, inv_l, p_l, x_l = variants["levelwise-float32"]
fwd_f, inv_f, p_f, x_f = variants["fused-float32"]
z_l, ld_l = fwd_l(p_l, x_l)
z_f, ld_f = fwd_f(p_f, x_f)
out["parity"] = {
    "fwd_max_abs": float(jnp.max(jnp.abs(z_l - z_f))),
    "fwd_logdet_max_abs": float(jnp.max(jnp.abs(ld_l - ld_f))),
}
xi_l, ldi_l = inv_l(p_l, x_l)
xi_f, ldi_f = inv_f(p_f, x_f)
out["parity"]["inv_max_abs"] = float(jnp.max(jnp.abs(xi_l - xi_f)))
out["parity"]["inv_logdet_max_abs"] = float(jnp.max(jnp.abs(ldi_l - ldi_f)))
print("parity:", out["parity"], flush=True)

# interleaved timing
for attr, idx in (("fwd", 0), ("inv", 1)):
    times = {tag: [] for tag in variants}
    for _ in range(5):
        for tag, (fwd, inv, p, x) in variants.items():
            fn = (fwd, inv)[idx]
            times[tag].append(timeit(lambda: fn(p, x)))
    for tag, ts in times.items():
        ms = statistics.median(ts) * 1e3
        out[tag][f"{attr}_ms"] = ms
        print(f"{tag} {attr}: {ms:.3f} ms", flush=True)

with open("artifacts/fused_onchip.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
