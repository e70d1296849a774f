"""Profile the flagship train step on the real chip, tunnel-robustly.

Timing discipline (hard-won; see docs/perf.md "Measurement discipline"):
* ``block_until_ready`` is NOT a reliable barrier through the axon tunnel
  (unchained timings measured 0.15 ms "forwards" — below the HBM floor);
* the FIRST execution of each program costs ~1-2 min (upload/warmup);
* per-dispatch overhead (~5-15 ms) rivals the step itself.

So every number here is a SLOPE: a whole epoch of n chained steps runs as
one ``lax.scan`` program (``Trainer.epoch_fn``), timed at two n's after a
warmup execution; (wall_hi - wall_lo)/(n_hi - n_lo) cancels the constant
dispatch+fetch offset exactly. Produces the remat A/B and the
levelwise-vs-fused train-step evidence (round-2 VERDICT #1/#2).

Stages (argv[1]):
  steps   - ms/step for levelwise-{f32,bf16} x remat on/off + fused-bf16
  trace   - jax.profiler trace of one scanned epoch (artifacts/trace/)
"""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from hint_tpu.configs import get_config
from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()
os.makedirs("artifacts", exist_ok=True)

NAME = "plus_shape.unconditional_hint_4_full"
B = 10000
N_LO, N_HI = 2, 8


def build(dtype, impl, remat):
    cfg = dataclasses.replace(get_config(NAME), batch_size=B)
    tr = cfg.make_trainer(compute_dtype=dtype, impl=impl, remat=remat)
    with jax.default_device(jax.devices("cpu")[0]):
        state = tr.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state, jax.devices()[0])
    k = jax.random.PRNGKey(1)
    xb = jax.device_put(
        jax.random.normal(k, (N_HI, B, cfg.ndim_x), jnp.float32), jax.devices()[0]
    )
    yb = jnp.zeros((N_HI, B, 0), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), N_HI)
    lr = jnp.asarray(1e-3, jnp.float32)
    return tr, state, xb, yb, keys, lr


def ms_per_step(tr, state, xb, yb, keys, lr):
    walls = {}
    st = state
    # warmup both program shapes (first execution is ~minutes through the
    # tunnel and must not be timed)
    for n in (N_LO, N_HI):
        st2, terms = tr.epoch_fn(st, xb[:n], yb[:n], keys[:n], lr)
        float(jnp.sum(terms))
        st = st2
    for n in (N_LO, N_HI, N_LO, N_HI, N_LO, N_HI):
        t0 = time.perf_counter()
        st, terms = tr.epoch_fn(st, xb[:n], yb[:n], keys[:n], lr)
        float(jnp.sum(terms))
        walls.setdefault(n, []).append(time.perf_counter() - t0)
    return (min(walls[N_HI]) - min(walls[N_LO])) / (N_HI - N_LO) * 1e3


def stage_steps():
    # merge into any existing results so variants can run one per process
    # (each costs minutes of compile+warmup through the tunnel). Prior
    # results are kept ONLY if they were measured under the same protocol
    # (batch + slope endpoints) — otherwise start fresh rather than mixing.
    out = {"batch": B, "n_lo": N_LO, "n_hi": N_HI}
    try:
        with open("artifacts/profile_steps.json") as f:
            prior = json.load(f)
        if all(prior.get(k) == out[k] for k in ("batch", "n_lo", "n_hi")):
            out.update({k: v for k, v in prior.items()
                        if k not in ("batch", "n_lo", "n_hi")})
        else:
            print(f"protocol changed ({prior.get('batch')},{prior.get('n_lo')},"
                  f"{prior.get('n_hi')}) -> ({B},{N_LO},{N_HI}); discarding prior")
    except Exception:
        pass
    only = sys.argv[2] if len(sys.argv) > 2 else None
    variants = [
        ("levelwise-float32", "float32", "levelwise", True),
        ("levelwise-float32-noremat", "float32", "levelwise", False),
        ("levelwise-bfloat16", "bfloat16", "levelwise", True),
        ("levelwise-bfloat16-noremat", "bfloat16", "levelwise", False),
        ("fused-bfloat16", "bfloat16", "fused", True),
    ]
    for tag, dtype, impl, remat in variants:
        if only and only != tag:
            continue
        if tag in out:
            continue
        try:
            t0 = time.time()
            tr, state, xb, yb, keys, lr = build(dtype, impl, remat)
            ms = ms_per_step(tr, state, xb, yb, keys, lr)
            out[tag] = {"step_ms": ms, "steps_per_s": 1e3 / ms,
                        "total_s": time.time() - t0}
            print(f"{tag}: {ms:.3f} ms/step ({1e3/ms:.1f} steps/s)", flush=True)
            with open("artifacts/profile_steps.json", "w") as f:
                json.dump(out, f, indent=2)
        except Exception as e:
            print(f"{tag}: FAIL {str(e).splitlines()[0][:160]}", flush=True)
    print(json.dumps(out))


def stage_trace():
    # trace the production configuration (levelwise, remat off — the
    # round-3 default)
    tr, state, xb, yb, keys, lr = build("float32", "levelwise", False)
    st, terms = tr.epoch_fn(state, xb, yb, keys, lr)  # warmup
    float(jnp.sum(terms))
    with jax.profiler.trace("artifacts/trace"):
        st, terms = tr.epoch_fn(st, xb, yb, keys, lr)
        float(jnp.sum(terms))
    print("trace written to artifacts/trace")


if __name__ == "__main__":
    {"steps": stage_steps, "trace": stage_trace}[sys.argv[1]]()
