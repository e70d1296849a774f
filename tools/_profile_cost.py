"""Adjudicate the flagship step's bottleneck (VERDICT round-1 weak #3).

For the flagship (plus_shape.unconditional_hint_4_full, d=100, 4 full-depth
HAC blocks) this measures, in ONE process (tunnel throughput varies between
processes, so every comparison must be in-process):

* XLA cost_analysis of the compiled train step / forward / inverse —
  flops + bytes accessed, straight from the compiler;
* measured device wall time (median of many reps, after warmup);
* derived: achieved FLOP/s vs v5e peak, achieved bytes/s vs HBM peak —
  whichever ratio is high names the bottleneck; if both are low the step is
  latency/serialization-bound (long dependent chain of small ops);
* the same for impl="fused" (whole-block kernel) so the Pallas decision
  (VERDICT next-round #2) rests on numbers.

Writes artifacts/profile_cost.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.configs import get_config
from hint_tpu.train.trainer import nll_terms
from hint_tpu.utils import enable_compilation_cache

FLAGSHIP = "plus_shape.unconditional_hint_4_full"
B = 10_000
REPS = 30

# v5e (one chip): ~197 TFLOP/s bf16, ~98 f32 (MXU), HBM ~819 GB/s
PEAK_F32 = 98e12
PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def analyze(name, fn, args, dtype, results):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    byts = float(ca.get("bytes accessed", float("nan")))
    med, best = timed(jax.jit(fn), *args)
    peak = PEAK_BF16 if dtype == "bfloat16" else PEAK_F32
    rec = {
        "ms_median": med * 1e3,
        "ms_best": best * 1e3,
        "flops": flops,
        "bytes_accessed": byts,
        "achieved_tflops": flops / best / 1e12,
        "mxu_util": flops / best / peak,
        "achieved_gbps": byts / best / 1e9,
        "hbm_util": byts / best / PEAK_HBM,
    }
    results[name] = rec
    print(
        f"{name}: {med*1e3:.2f} ms (best {best*1e3:.2f}) | "
        f"{rec['achieved_tflops']:.2f} TFLOP/s ({rec['mxu_util']*100:.1f}% MXU) | "
        f"{rec['achieved_gbps']:.0f} GB/s ({rec['hbm_util']*100:.1f}% HBM)",
        flush=True,
    )
    return rec


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    results = {"batch": B}
    for dtype in ("float32", "bfloat16"):
        for impl in ("levelwise", "fused"):
            cfg = get_config(FLAGSHIP)
            trainer = cfg.make_trainer(compute_dtype=dtype, impl=impl)
            model = trainer.model
            state = trainer.init_state(jax.random.PRNGKey(0))
            x = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.ndim_x), jnp.float32)
            y = jnp.zeros((B, 0), jnp.float32)
            lr = jnp.asarray(1e-3, jnp.float32)
            key = jax.random.PRNGKey(2)
            tag = f"{dtype}_{impl}"

            def fwd(params, x):
                z, logdet = model.forward(params, x)
                t1, t2 = nll_terms(z, logdet)
                return t1 + t2

            def inv(params, z):
                return model.inverse(params, z)[0]

            analyze(f"fwd_{tag}", fwd, (state.params, x), dtype, results)
            analyze(f"inv_{tag}", inv, (state.params, x), dtype, results)
            step = trainer.step_fn

            # step_fn donates state; time it manually feeding back the state
            state2 = trainer.init_state(jax.random.PRNGKey(0))
            s, _ = step(state2, x, y, key, lr)
            jax.block_until_ready(s.params)
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                s, terms = step(s, x, y, key, lr)
                jax.block_until_ready(terms)
                ts.append(time.perf_counter() - t0)
            med, best = float(np.median(ts)), float(np.min(ts))
            lowered = None
            # cost analysis for the full step via a non-donating jit
            def full_step(state, x, y, key, lr):
                return step(state, x, y, key, lr)

            try:
                ca = jax.jit(full_step).lower(state2, x, y, key, lr).compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                flops = float(ca.get("flops", float("nan")))
                byts = float(ca.get("bytes accessed", float("nan")))
            except Exception as e:
                print("step cost_analysis failed:", e)
                flops = byts = float("nan")
            peak = PEAK_BF16 if dtype == "bfloat16" else PEAK_F32
            rec = {
                "ms_median": med * 1e3,
                "ms_best": best * 1e3,
                "steps_per_s": 1.0 / med,
                "flops": flops,
                "bytes_accessed": byts,
                "achieved_tflops": flops / best / 1e12,
                "mxu_util": flops / best / peak,
                "achieved_gbps": byts / best / 1e9,
                "hbm_util": byts / best / PEAK_HBM,
            }
            results[f"step_{tag}"] = rec
            print(
                f"step_{tag}: {med*1e3:.2f} ms ({1/med:.1f} steps/s) | "
                f"{rec['achieved_tflops']:.2f} TFLOP/s ({rec['mxu_util']*100:.1f}% MXU) | "
                f"{rec['achieved_gbps']:.0f} GB/s ({rec['hbm_util']*100:.1f}% HBM)",
                flush=True,
            )

    with open("artifacts/profile_cost.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote artifacts/profile_cost.json")


if __name__ == "__main__":
    main()
