"""Conditional lens experiment on TPU: train conditional HINT (two-lane) and
cINN, compare posterior samples vs quantile-ABC ground truth (MMD +
forward-process distance), reusing the cached 100k prior pairs as ABC pool."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp

from hint_tpu.configs import get_config
import hint_tpu.configs.registry_data as rd
from hint_tpu.utils import enable_compilation_cache
enable_compilation_cache()

os.makedirs("artifacts", exist_ok=True)
for name in ("lens_shape.conditional_hint_1_full", "lens_shape.conditional_cinn_1"):
    rd.CONFIGS[name] = {**rd.CONFIGS[name], "n_train": 100000, "n_test": 10000}

trained = {}
for name in ("lens_shape.conditional_hint_1_full", "lens_shape.conditional_cinn_1"):
    cfg = get_config(name)
    (xtr, ytr), (xte, yte) = cfg.load_data("data")
    trainer = cfg.make_trainer()
    t0 = time.time()
    state, final = trainer.fit(jax.random.PRNGKey(0), (jnp.asarray(xtr), jnp.asarray(ytr)),
                               (jnp.asarray(xte), jnp.asarray(yte)))
    mins = (time.time()-t0)/60
    print(f"{name}: final test loss {final:.4f} ({mins:.1f} min)", flush=True)
    trained[name] = (cfg, trainer, state, float(final), mins)
    from hint_tpu.train import checkpoint
    checkpoint.save_npz(f"artifacts/{name.replace('.','-')}.npz", state)

# ABC comparison: pool = cached train pairs
from hint_tpu.evaluation.abc import quantile_ABC
from hint_tpu.evaluation.mmd import multi_mmd
from hint_tpu.evaluation.metrics import mean_target_distance
from hint_tpu.evaluation.sampling import sample_model
from hint_tpu.data.fourier import LensShapeModel

dm = LensShapeModel()
x_pool = np.load("data/lens-shape1_x_train.npy")
y_pool = np.load("data/lens-shape1_y_train.npy")
rng = np.random.default_rng(0)
n_targets, n_post = 20, 1000
res = {name: {"mmds": [], "dists": [], "times": []} for name in trained}
for i in range(n_targets):
    y_t = dm.forward_process(dm.sample_prior(1)).astype(np.float32)[0]
    gt, thr = quantile_ABC(x_pool, y_pool, y_t, n=n_post)
    for name, (cfg, trainer, state, _, _) in trained.items():
        t0 = time.time()
        samp = np.asarray(sample_model(cfg, trainer.model, state.params, n_post,
                                       jax.random.PRNGKey(100+i), y_target=y_t))
        dt = time.time()-t0
        res[name]["mmds"].append(float(multi_mmd(jnp.asarray(samp), jnp.asarray(gt))))
        res[name]["dists"].append(mean_target_distance(dm, y_t, samp))
        res[name]["times"].append(dt)
    print(i, {n: round(res[n]["mmds"][-1],4) for n in res}, flush=True)

summary = {}
for name, (cfg, trainer, state, final, mins) in trained.items():
    summary[name] = dict(
        final_test_loss=final, minutes=mins,
        posterior_mmd_mean=float(np.mean(res[name]["mmds"])),
        posterior_mmd_std=float(np.std(res[name]["mmds"])),
        target_dist_mean=float(np.mean(res[name]["dists"])),
        sample_seconds=float(np.mean(res[name]["times"][1:])) if len(res[name]["times"])>1 else None,
    )
with open("artifacts/lens_conditional_results.json", "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary, indent=2))
