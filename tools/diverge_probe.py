#!/usr/bin/env python
"""Instrumented rerun of a diverging grid config: find the NaN onset and the
mechanism (VERDICT r3 weak-spot #3).

Records, per batch: loss terms, max |log-det| per sample, max |z|, global
grad norm (pre-clamp), and the current lr. Stops a few batches after the
first non-finite loss and writes artifacts/diverge_<config>_s<seed>.json
plus a loss/diagnostic PNG.

Usage:
    python tools/diverge_probe.py [config] [seed] [n_epochs]
    # default: plus_shape.unconditional_hint_16_0_big seed 0 (nan in the
    # round-3 grid, train_log.json), 8 epochs max
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hint_tpu.configs import get_config
from hint_tpu.train.optim import lr_schedule


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "plus_shape.unconditional_hint_16_0_big"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    max_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = get_config(config)
    trainer = cfg.make_trainer()
    (x_tr, _), _ = cfg.load_data("data")
    x_tr = jnp.asarray(x_tr)

    model = trainer.model

    @jax.jit
    def diagnostics(params, x, noise_key, lr):
        xn = x + trainer.noise_std * jax.random.normal(noise_key, x.shape, x.dtype)

        def loss_fn(p):
            total, terms = trainer._loss(p, xn, None, True)
            return total, terms

        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        z, logdet = model.forward(params, xn)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)))
        gmax = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in jax.tree.leaves(grads)]))
        return (
            jnp.stack(terms[:2]),
            jnp.max(jnp.abs(logdet)),
            jnp.max(jnp.abs(z)),
            gnorm,
            gmax,
        )

    # replicate Trainer.fit's key discipline exactly (same batches/noise as
    # the campaign run that diverged)
    key = jax.random.PRNGKey(seed)
    k_state, key = jax.random.split(key)
    state = trainer.init_state(k_state)

    rec = {"config": config, "seed": seed, "batches_per_epoch": None, "steps": []}
    nan_seen = 0
    for epoch in range(min(cfg.n_epochs, max_epochs)):
        lr = lr_schedule(epoch, cfg.lr_init, cfg.pre_low_lr, cfg.final_decay,
                         cfg.n_epochs, trainer.lr_semantics)
        key, k_tr, _k_te = jax.random.split(key, 3)
        k_perm, k_noise = jax.random.split(k_tr)
        perm, n_batches = trainer._batches(k_perm, x_tr.shape[0], True)
        rec["batches_per_epoch"] = int(n_batches)
        x_sh = x_tr[perm]
        noise_keys = jax.random.split(k_noise, n_batches)
        for b in range(n_batches):
            xb = jax.lax.dynamic_slice_in_dim(x_sh, b * trainer.batch_size, trainer.batch_size)
            terms, ld, zmax, gnorm, gmax = diagnostics(state.params, xb, noise_keys[b], lr)
            state, _ = trainer.step_fn(state, xb, jnp.zeros((xb.shape[0], 0), xb.dtype),
                                       noise_keys[b], lr)
            row = {
                "epoch": epoch, "batch": b, "lr": float(lr),
                "loss": [float(t) for t in np.asarray(terms)],
                "max_abs_logdet": float(ld), "max_abs_z": float(zmax),
                "grad_norm": float(gnorm), "grad_max": float(gmax),
            }
            rec["steps"].append(row)
            if b % 10 == 0 or not np.isfinite(row["loss"]).all():
                print(f"e{epoch} b{b}: loss={row['loss'][0]:.2f},{row['loss'][1]:.2f} "
                      f"|logdet|max={row['max_abs_logdet']:.1f} |z|max={row['max_abs_z']:.1f} "
                      f"gnorm={row['grad_norm']:.2e} gmax={row['grad_max']:.2e} lr={row['lr']:.4f}",
                      flush=True)
            if not np.isfinite(row["loss"]).all():
                nan_seen += 1
                if nan_seen >= 5:
                    break
        if nan_seen >= 5:
            break

    out = f"artifacts/diverge_{config.split('.')[-1]}_s{seed}.json"
    os.makedirs("artifacts", exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f)
    print(f"wrote {out} ({len(rec['steps'])} steps)")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = rec["steps"]
        t = np.arange(len(steps))
        loss = np.array([s["loss"][0] + s["loss"][1] for s in steps])
        fig, ax = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        ax[0].plot(t, loss); ax[0].set_ylabel("train loss")
        ax[1].semilogy(t, [max(s["grad_norm"], 1e-12) for s in steps])
        ax[1].set_ylabel("grad norm (pre-clamp)")
        ax[2].plot(t, [s["max_abs_logdet"] for s in steps], label="|logdet| max")
        ax[2].plot(t, [s["max_abs_z"] for s in steps], label="|z| max")
        ax[2].legend(); ax[2].set_ylabel("magnitudes"); ax[2].set_xlabel("step")
        png = out.replace(".json", ".png")
        fig.savefig(png, dpi=110, bbox_inches="tight")
        print(f"wrote {png}")
    except Exception as e:
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
