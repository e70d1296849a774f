"""Profile the flagship train step on the real chip, tunnel-robustly.

The axon tunnel's throughput varies 20-50x between processes, so every
comparison here is *interleaved within one process* (A/B/A/B medians), and a
baseline re-measure brackets the run. Produces the evidence for the Pallas
win-or-retire decision (round-1 VERDICT #2/#3).

Stages (argv[1]):
  steps   - interleaved medians: levelwise-f32 / fused-f32 / levelwise-bf16
            full step + forward-only + grad-only at batch 10000; batch sweep
  trace   - jax.profiler trace of 30 levelwise-f32 steps (artifacts/trace/)
"""
import dataclasses
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

from hint_tpu.configs import get_config
from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()
os.makedirs("artifacts", exist_ok=True)

NAME = "plus_shape.unconditional_hint_4_full"


def build(batch, dtype, impl, remat):
    cfg = dataclasses.replace(get_config(NAME), batch_size=batch)
    tr = cfg.make_trainer(compute_dtype=dtype, impl=impl, remat=remat)
    # init on host CPU (eager init through the axon tunnel costs minutes of
    # per-op RTT), then one bulk transfer to the chip
    with jax.default_device(jax.devices("cpu")[0]):
        state = tr.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state, jax.devices()[0])
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.ndim_x), jnp.float32)
    y = jnp.zeros((batch, 0), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), 512)
    return tr, state, x, y, lr, keys


class Variant:
    """One (impl, dtype, remat) variant with step / fwd / inv / grad callables."""

    def __init__(self, batch, dtype, impl, remat=True):
        self.name = f"{impl}-{dtype}-b{batch}" + ("" if remat else "-noremat")
        tr, self.state, self.x, self.y, self.lr, self.keys = build(batch, dtype, impl, remat)
        self.tr = tr
        model = tr.model
        self._fwd = jax.jit(lambda p, xx: model.forward(p, xx))
        self._inv = jax.jit(lambda p, zz: model.inverse(p, zz))

        def loss(p, xx):
            z, ld = model.forward(p, xx)
            return (0.5 * jnp.sum(z**2, 1) - ld).mean()

        self._grad = jax.jit(jax.grad(loss))
        self.ki = 0

    def step(self):
        self.ki += 1
        self.state, terms = self.tr.step_fn(
            self.state, self.x, self.y, self.keys[self.ki % 500], self.lr
        )
        return terms

    def fwd(self):
        return self._fwd(self.state.params, self.x)

    def inv(self):
        return self._inv(self.state.params, self.x)

    def grad(self):
        return self._grad(self.state.params, self.x)


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def interleaved(variants, attr, n_rounds=5, n_inner=10):
    """Median-of-rounds per variant, rounds interleaved across variants so
    tunnel drift hits everyone equally."""
    times = {v.name: [] for v in variants}
    for _ in range(n_rounds):
        for v in variants:
            times[v.name].append(timeit(getattr(v, attr), n_inner))
    return {k: statistics.median(ts) for k, ts in times.items()}


def stage_steps():
    out = {}
    variants = [
        Variant(10000, "float32", "levelwise"),
        Variant(10000, "float32", "levelwise", remat=False),
        Variant(10000, "float32", "fused"),
        Variant(10000, "bfloat16", "levelwise"),
        Variant(10000, "bfloat16", "fused"),
    ]
    for attr in ("step", "fwd", "inv", "grad"):
        med = interleaved(variants, attr)
        for k, v in med.items():
            out.setdefault(k, {})[attr + "_ms"] = v * 1e3
            print(f"{k} {attr}: {v*1e3:.3f} ms", flush=True)
    # batch sweep, levelwise f32 (latency-vs-throughput signature)
    sweep = [Variant(b, "float32", "levelwise") for b in (1000, 40000)]
    med = interleaved(sweep, "step", n_rounds=3)
    for k, v in med.items():
        out.setdefault(k, {})["step_ms"] = v * 1e3
        print(f"{k} step: {v*1e3:.3f} ms", flush=True)
    with open("artifacts/profile_steps.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def stage_trace():
    v = Variant(10000, "float32", "levelwise")
    jax.block_until_ready(v.step())
    with jax.profiler.trace("artifacts/trace"):
        for _ in range(30):
            terms = v.step()
        jax.block_until_ready(terms)
    print("trace written to artifacts/trace")


if __name__ == "__main__":
    {"steps": stage_steps, "trace": stage_trace}[sys.argv[1]]()
