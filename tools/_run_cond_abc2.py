"""Conditional posterior comparison against a 2M-sample quantile-ABC pool
(native generator), using the saved conditional checkpoints."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp

from hint_tpu.configs import get_config
import hint_tpu.configs.registry_data as rd
from hint_tpu.utils import enable_compilation_cache
from hint_tpu.evaluation.abc import prepare_samples, quantile_ABC
from hint_tpu.evaluation.mmd import multi_mmd
from hint_tpu.evaluation.metrics import mean_target_distance
from hint_tpu.evaluation.sampling import sample_model
from hint_tpu.data.fourier import LensShapeModel
from hint_tpu.train import checkpoint

enable_compilation_cache()

t0 = time.time()
x_pool, y_pool = prepare_samples(LensShapeModel, 2_000_000, out_dir="abc", chunk=200_000, n_workers=1)
print(f"pool: {x_pool.shape} in {time.time()-t0:.1f}s", flush=True)

for name in ("lens_shape.conditional_hint_1_full", "lens_shape.conditional_cinn_1"):
    rd.CONFIGS[name] = {**rd.CONFIGS[name], "n_train": 100000, "n_test": 10000}

models = {}
for name in ("lens_shape.conditional_hint_1_full", "lens_shape.conditional_cinn_1"):
    cfg = get_config(name)
    trainer = cfg.make_trainer()
    template = trainer.init_state(jax.random.PRNGKey(0))
    state = checkpoint.load_npz(f"artifacts/{name.replace('.','-')}.npz", template)
    models[name] = (cfg, trainer, state)

dm = LensShapeModel()
n_targets, n_post = 50, 4000   # reference sample_size=4000
res = {name: {"mmds": [], "dists": []} for name in models}
np.random.seed(123)
for i in range(n_targets):
    y_t = dm.forward_process(dm.sample_prior(1)).astype(np.float32)[0]
    gt, thr = quantile_ABC(x_pool, y_pool, y_t, n=n_post)
    for name, (cfg, trainer, state) in models.items():
        samp = np.asarray(sample_model(cfg, trainer.model, state.params, n_post,
                                       jax.random.PRNGKey(500+i), y_target=y_t))
        res[name]["mmds"].append(float(multi_mmd(jnp.asarray(samp), jnp.asarray(gt))))
        res[name]["dists"].append(mean_target_distance(dm, y_t, samp))
    if i % 10 == 0:
        print(i, {n: round(np.mean(res[n]["mmds"]),4) for n in res}, flush=True)

summary = {name: dict(posterior_mmd_mean=float(np.mean(r["mmds"])),
                      posterior_mmd_std=float(np.std(r["mmds"])),
                      target_dist_mean=float(np.mean(r["dists"])))
           for name, r in res.items()}
with open("artifacts/lens_conditional_abc2M.json", "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary, indent=2))
