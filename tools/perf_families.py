"""Per-family training throughput + roofline table (VERDICT r3 #5).

Flagship-only numbers leave "is it fast?" unanswered for the rest of the
zoo. This measures, for one representative config per family, the
slope-timed steps/s of the real train step plus the compiler's own
flops/bytes (cost_analysis) so each row can say WHICH resource binds —
MXU, HBM, or neither (latency/serialization-bound small model).

Timing discipline (docs/perf.md): every number is a SLOPE — a scanned
epoch of n chained steps timed at two n's after warmup;
(wall_hi − wall_lo)/(n_hi − n_lo) cancels the tunnel's constant
dispatch+fetch offset. cost_analysis flops/bytes are per single step.

Run on the real chip:
    python tools/perf_families.py            # all remaining variants
    python tools/perf_families.py <tag>      # one variant (process-isolated)
    python tools/perf_families.py compile32  # scan-vs-unroll compile timing

Merges into artifacts/perf_families.json (idempotent per tag).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.configs import get_config

OUT = "artifacts/perf_families.json"
N_LO, N_HI = 2, 8

# v5e (one chip): ~197 TFLOP/s bf16, ~98 f32 (MXU), HBM ~819 GB/s
PEAK = {"float32": 98e12, "bfloat16": 197e12}
PEAK_HBM = 819e9

# (tag, config, dtype) — reference batch sizes; each family's d is what
# decides the regime (d=100 flagship vs d=6 POWER-sized matmuls)
VARIANTS = [
    ("plus-hint4full-f32", "plus_shape.unconditional_hint_4_full", "float32"),
    ("plus-hint4full-bf16", "plus_shape.unconditional_hint_4_full", "bfloat16"),
    ("lens-hint2full-f32", "lens_shape.unconditional_hint_2_full", "float32"),
    ("lens-hint2full-bf16", "lens_shape.unconditional_hint_2_full", "bfloat16"),
    ("plus-cond-hint4full-f32", "plus_shape.conditional_hint_4_full", "float32"),
    ("plus-cond-hint4full-bf16", "plus_shape.conditional_hint_4_full", "bfloat16"),
    ("uci-power-hint4-f32", "uci_data.power_hint_4", "float32"),
    ("uci-gas-hint8-f32", "uci_data.gas_hint_8", "float32"),
    ("uci-miniboone-hint4-f32", "uci_data.miniboone_hint_4", "float32"),
    ("uci-miniboone-hint4-bf16", "uci_data.miniboone_hint_4", "bfloat16"),
]


def _init_device():
    """Initialize params on host CPU when that backend exists (keeps HBM
    clean for the timed buffers); under the axon plugin the TPU can be the
    ONLY in-process backend, and init there is just as correct."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


def _load():
    try:
        with open(OUT) as f:
            out = json.load(f)
    except Exception:
        return {"n_lo": N_LO, "n_hi": N_HI}
    # drop pre-r5 rows measured under the broken cost-model HBM basis
    # (hbm_util up to 805%, VERDICT r4 weak #2) so they re-measure
    for tag in [t for t, r in out.items()
                if isinstance(r, dict) and "hbm_util" in r]:
        del out[tag]
    return out


def _save(out):
    os.makedirs("artifacts", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)


def build(config: str, dtype: str):
    cfg = get_config(config)
    tr = cfg.make_trainer(compute_dtype=dtype)
    with jax.default_device(_init_device()):
        state = tr.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state, jax.devices()[0])
    b = cfg.batch_size
    xb = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (N_HI, b, cfg.ndim_x), jnp.float32),
        jax.devices()[0],
    )
    yb = jnp.zeros((N_HI, b, cfg.ndim_y), jnp.float32)
    if cfg.is_conditional:
        yb = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(3), (N_HI, b, cfg.ndim_y), jnp.float32),
            jax.devices()[0],
        )
    keys = jax.random.split(jax.random.PRNGKey(2), N_HI)
    lr = jnp.asarray(1e-3, jnp.float32)
    return cfg, tr, state, xb, yb, keys, lr


def slope_ms(tr, state, xb, yb, keys, lr):
    walls = {}
    st = state
    for n in (N_LO, N_HI):  # warmup both program shapes
        st, terms = tr.epoch_fn(st, xb[:n], yb[:n], keys[:n], lr)
        float(jnp.sum(terms))
    for n in (N_LO, N_HI, N_LO, N_HI, N_LO, N_HI):
        t0 = time.perf_counter()
        st, terms = tr.epoch_fn(st, xb[:n], yb[:n], keys[:n], lr)
        float(jnp.sum(terms))
        walls.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(walls[N_HI]) - min(walls[N_LO])) / (N_HI - N_LO) * 1e3


def step_cost(tr, state, xb, yb, keys, lr):
    """Single-step flops/bytes from the compiler (lower() never executes,
    so the donated state stays live for the slope timing after)."""
    lowered = tr.step_fn.lower(state, xb[0], yb[0], keys[0], lr)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan"))), float(ca.get("bytes accessed", float("nan")))


def hbm_bytes_floor(state, xb, yb, dtype):
    """LOWER bound on true per-step HBM traffic, from first principles:
    the optimizer must read and write every param/opt-state element once
    (Adam: p, m, v), and the batch must be read once. Activations are
    assumed perfectly fused (zero HBM round trips), which is what makes
    this a floor. The XLA cost model's "bytes accessed" is the matching
    UPPER bound — it charges fusion-INTERNAL traffic as if it hit HBM,
    which is why round-4's table printed 805% HBM utilization
    (VERDICT r4 weak #2); utilizations derived here are physical."""
    item = 2 if dtype == "bfloat16" else 4
    state_b = sum(
        l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(state)
        if hasattr(l, "dtype")
    )
    batch_b = xb[0].size * item + yb[0].size * item
    return 2 * state_b + batch_b


def run_variant(tag, config, dtype, out):
    t0 = time.time()
    cfg, tr, state, xb, yb, keys, lr = build(config, dtype)
    flops, byts = step_cost(tr, state, xb, yb, keys, lr)
    floor_b = hbm_bytes_floor(state, xb, yb, dtype)
    ms = slope_ms(tr, state, xb, yb, keys, lr)
    s = ms / 1e3
    # time each resource WOULD need at peak; the bound is whichever floor
    # explains the measured step, or "latency" when neither comes close
    # (tiny sequential subnet matmuls serialize — docs/perf.md round 3)
    t_mxu = flops / PEAK[dtype]
    t_hbm = floor_b / PEAK_HBM
    rec = {
        "config": config, "dtype": dtype, "batch": cfg.batch_size,
        "ndim_x": cfg.ndim_x, "step_ms": ms, "steps_per_s": 1e3 / ms,
        "flops": flops,
        "cost_bytes_upper": byts,  # XLA cost model; counts fusion-internal
        "hbm_bytes_floor": floor_b,  # params/opt read+write + batch read
        "achieved_tflops": flops / s / 1e12,
        "mxu_util": t_mxu / s,
        "hbm_util_floor": t_hbm / s,
        "rows_per_s": cfg.batch_size / s,
        "total_s": time.time() - t0,
    }
    bound = ("MXU" if rec["mxu_util"] >= max(rec["hbm_util_floor"], 0.25)
             else "HBM" if rec["hbm_util_floor"] > 0.25 else "latency")
    rec["bound"] = bound
    out[tag] = rec
    print(f"{tag}: {ms:.3f} ms/step ({1e3/ms:.1f} steps/s, "
          f"{rec['rows_per_s']:,.0f} rows/s) | {rec['achieved_tflops']:.2f} TFLOP/s "
          f"({rec['mxu_util']*100:.1f}% MXU) | HBM floor "
          f"{rec['hbm_util_floor']*100:.1f}% -> {bound}-bound", flush=True)
    _save(out)


def run_compile32(out):
    """Scan-vs-unroll compile-time A/B on the 32-block grid configs, plus a
    one-step result parity check (records the ScannedRepeat win)."""
    for config in ("plus_shape.unconditional_inn_32",
                   "plus_shape.unconditional_hint_32_0_big"):
        rec = {}
        for mode, scan in (("scanned", True), ("unrolled", False)):
            cfg = dataclasses.replace(get_config(config), batch_size=1000)
            tr = cfg.make_trainer(scan_blocks=scan)
            with jax.default_device(_init_device()):
                state = tr.init_state(jax.random.PRNGKey(0))
            state = jax.device_put(state, jax.devices()[0])
            x = jax.device_put(
                jax.random.normal(jax.random.PRNGKey(1), (cfg.batch_size, cfg.ndim_x)),
                jax.devices()[0])
            y = jnp.zeros((cfg.batch_size, 0), jnp.float32)
            args = (state, x, y, jax.random.PRNGKey(2), jnp.asarray(1e-3))
            t0 = time.perf_counter()
            lowered = tr.step_fn.lower(*args)
            compiled = lowered.compile()
            rec[f"{mode}_compile_s"] = time.perf_counter() - t0
            st, terms = tr.step_fn(*args)
            rec[f"{mode}_first_terms"] = [float(t) for t in np.asarray(terms)]
            print(f"{config} {mode}: compile {rec[f'{mode}_compile_s']:.1f}s "
                  f"terms={rec[f'{mode}_first_terms']}", flush=True)
        rec["terms_close"] = bool(np.allclose(
            rec["scanned_first_terms"], rec["unrolled_first_terms"], atol=1e-4))
        out[f"compile32:{config.split('.')[-1]}"] = rec
        _save(out)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    out = _load()
    print("devices:", jax.devices(), flush=True)
    if only == "compile32":
        run_compile32(out)
        return
    for tag, config, dtype in VARIANTS:
        if only and only != tag:
            continue
        if tag in out:
            print(f"{tag}: cached", flush=True)
            continue
        try:
            run_variant(tag, config, dtype, out)
        except Exception as e:
            print(f"{tag}: FAIL {str(e).splitlines()[0][:160]}", flush=True)
    if not only and "compile32:unconditional_inn_32" not in out:
        run_compile32(out)


if __name__ == "__main__":
    main()
