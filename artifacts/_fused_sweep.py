"""Tile/chunk sweep of the fused dense-level kernel vs levelwise, on-chip.

Timing discipline for the axon tunnel (hard-won):
* ``block_until_ready`` is NOT a reliable barrier here — unchained timings
  measured 0.15 ms "forwards", below the HBM floor (dispatch-rate artifacts);
* per-call dispatch costs ~0.1-1 s RTT, so host-side loops of sub-10 ms
  computations measure the tunnel, not the chip;
* therefore: chain N forwards INSIDE one jit via ``lax.fori_loop`` (one
  dispatch), fetch one scalar, and take the slope between two loop lengths —
  the constant dispatch+fetch offset cancels exactly.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

from hint_tpu.configs import get_config
from hint_tpu.ops.hac import HierarchicalAffineCoupling
from hint_tpu.ops.pallas_block import _run_fused
from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices(), flush=True)

NAME = "plus_shape.unconditional_hint_4_full"
B = 10000
N_LO, N_HI = 4, 24

VARIANTS = {
    "bfloat16": [None, (400, 512), (1000, 512), (1000, 1024)],
    "float32": [None, (400, 512), (1000, 512)],
}


def flow_forward(fmodel, tile, chunk):
    """Forward through the flow; HAC blocks via the fused kernel when
    (tile, chunk) given, else the model's own engine."""

    def fwd(p, xx):
        x_, ld = xx, jnp.zeros(xx.shape[:1], xx.dtype)
        for i, b in enumerate(fmodel.bijectors):
            bp = p[f"b{i}"]
            if tile is not None and isinstance(b, HierarchicalAffineCoupling):
                x_, j = _run_fused(b, bp, x_, None, False, tile, chunk)
            else:
                x_, j = b.forward(bp, x_)
            ld = ld + j
        return x_

    return fwd


def make_loop(fwd, n):
    @jax.jit
    def g(p, x):
        return jax.lax.fori_loop(0, n, lambda i, xx: fwd(p, xx), x)

    return g


def run_one(tag, fwd, params, x):
    out = {}
    for n in (N_LO, N_HI):
        g = make_loop(fwd, n)
        t0 = time.time()
        r = g(params, x)
        float(jnp.sum(r))  # compile + settle
        out[f"compile_n{n}_s"] = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(params, x)
            float(jnp.sum(r))
            ts.append(time.perf_counter() - t0)
        out[f"wall_n{n}_s"] = min(ts)
    per = (out[f"wall_n{N_HI}_s"] - out[f"wall_n{N_LO}_s"]) / (N_HI - N_LO)
    out["per_fwd_ms"] = per * 1e3
    print(f"{tag}: {per*1e3:.3f} ms/fwd "
          f"(walls {out[f'wall_n{N_LO}_s']:.3f}/{out[f'wall_n{N_HI}_s']:.3f} s)", flush=True)
    return out


results = {"batch": B, "n_lo": N_LO, "n_hi": N_HI}
cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
for dtype, variants in VARIANTS.items():
    cfg = get_config(NAME)
    tr = cfg.make_trainer(compute_dtype=dtype, impl="levelwise")
    with jax.default_device(cpu):
        state = tr.init_state(jax.random.PRNGKey(0))
    params = jax.device_put(state.params, tpu)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, cfg.ndim_x), jnp.float32), tpu
    )
    for v in variants:
        tag = (f"levelwise-{dtype}" if v is None
               else f"fused-{dtype}-t{v[0]}-c{v[1]}")
        fwd = flow_forward(tr.model, *(v or (None, None)))
        try:
            results[tag] = run_one(tag, fwd, params, x)
        except Exception as e:
            print(f"{tag}: FAIL {str(e).splitlines()[0][:160]}", flush=True)

with open("artifacts/fused_sweep.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps({k: (v["per_fwd_ms"] if isinstance(v, dict) else v)
                  for k, v in results.items()}))
