"""Tile/chunk sweep of the fused dense-level kernel vs levelwise, on-chip.

Timing discipline for the axon tunnel (hard-won, see docs/perf.md):
* ``block_until_ready`` is NOT a reliable barrier here — unchained timings
  measured 0.15 ms "forwards", below the HBM floor (dispatch artifacts);
* the FIRST execution of each compiled program costs ~2 min (program
  upload/warmup); subsequent calls have ~ms overhead;
* therefore: ONE program per variant — n chained forwards via
  ``lax.fori_loop`` with a *traced* trip count — warmed once, then timed at
  two loop lengths; the slope cancels the constant dispatch+fetch offset.

Usage: python artifacts/_fused_sweep.py [bfloat16|float32] ...
"""
import json
import os
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


def flow_forward(fmodel, tile, chunk, rev=False):
    """Forward (or inverse) through the flow; HAC blocks via the fused
    kernel when (tile, chunk) given, else the model's own engine."""

    def fwd(p, xx):
        x_ = xx
        idx = range(len(fmodel.bijectors))
        order = idx if not rev else reversed(idx)
        for i in order:
            b = fmodel.bijectors[i]
            bp = p[f"b{i}"]
            if tile is not None and isinstance(b, HierarchicalAffineCoupling):
                x_, _ = _run_fused(b, bp, x_, None, rev, tile, chunk)
            elif not rev:
                x_, _ = b.forward(bp, x_)
            else:
                x_, _ = b.inverse(bp, x_)
        return x_

    return fwd


def run_one(tag, fwd, params, x):
    @jax.jit
    def g(p, xx, n):
        return jax.lax.fori_loop(0, n, lambda i, z: fwd(p, z), xx)

    out = {}
    t0 = time.time()
    float(jnp.sum(g(params, x, 2)))  # compile + first-execution warmup
    out["warmup_s"] = time.time() - t0
    walls = {}
    for n in (N_LO, N_HI, N_LO, N_HI, N_LO, N_HI):
        t0 = time.perf_counter()
        float(jnp.sum(g(params, x, n)))
        walls.setdefault(n, []).append(time.perf_counter() - t0)
    lo, hi = min(walls[N_LO]), min(walls[N_HI])
    per = (hi - lo) / (N_HI - N_LO)
    out.update(wall_lo_s=lo, wall_hi_s=hi, per_fwd_ms=per * 1e3)
    print(f"{tag}: {per*1e3:.3f} ms/fwd (warmup {out['warmup_s']:.0f}s, "
          f"walls {lo:.3f}/{hi:.3f}s)", flush=True)
    return out


def main():
    dtypes = sys.argv[1:] or ["bfloat16"]
    path = "artifacts/fused_sweep.json"
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results.update({"batch": B, "n_lo": N_LO, "n_hi": N_HI})
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    for dtype in dtypes:
        cfg = get_config(NAME)
        tr = cfg.make_trainer(compute_dtype=dtype, impl="levelwise")
        with jax.default_device(cpu):
            state = tr.init_state(jax.random.PRNGKey(0))
        params = jax.device_put(state.params, tpu)
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (B, cfg.ndim_x), jnp.float32), tpu
        )
        for v in VARIANTS[dtype]:
            tag = (f"levelwise-{dtype}" if v is None
                   else f"fused-{dtype}-t{v[0]}-c{v[1]}")
            fwd = flow_forward(tr.model, *(v or (None, None)))
            try:
                results[tag] = run_one(tag, fwd, params, x)
            except Exception as e:
                print(f"{tag}: FAIL {str(e).splitlines()[0][:160]}", flush=True)
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps({k: (v.get("per_fwd_ms") if isinstance(v, dict) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
