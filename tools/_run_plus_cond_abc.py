"""Plus-shape conditional posterior comparison vs target-conditioned
rejection GT (native): 5 targets x 2000-sample posteriors."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
from hint_tpu.configs import get_config
import hint_tpu.configs.registry_data as rd
from hint_tpu.utils import enable_compilation_cache
from hint_tpu.evaluation.mmd import multi_mmd
from hint_tpu.evaluation.sampling import sample_model
from hint_tpu.data import native
from hint_tpu.data.fourier import PlusShapeModel
from hint_tpu.train import checkpoint
enable_compilation_cache()

NAMES = ("plus_shape.conditional_hint_4_full", "plus_shape.conditional_cinn_4")
for name in NAMES:
    rd.CONFIGS[name] = {**rd.CONFIGS[name], "n_train": 100000, "n_test": 10000}
models = {}
for name in NAMES:
    cfg = get_config(name)
    trainer = cfg.make_trainer()
    template = trainer.init_state(jax.random.PRNGKey(0))
    state = checkpoint.load_npz(f"artifacts/{name.replace('.','-')}.npz", template)
    models[name] = (cfg, trainer, state)

dm = PlusShapeModel()
n_post = 2000
res = {name: {"mmds": []} for name in models}
os.makedirs("abc/plus-shape", exist_ok=True)
np.random.seed(7)
targets = []
for i in range(5):
    _, label = dm.generate_plus_shape(forward=True)
    targets.append(label.astype(np.float32))
for i, y_t in enumerate(targets):
    f_gt = f"abc/plus-shape/gt_{i:03}.npy"
    if os.path.exists(f_gt):
        gt = np.load(f_gt)
    else:
        t0 = time.time()
        gt, _ = native.sample_plus_conditional(y_t, n_post, tol=0.05, seed=100+i)
        print(f"target {i}: GT {gt.shape} in {time.time()-t0:.0f}s", flush=True)
        np.save(f_gt, gt)
    for name, (cfg, trainer, state) in models.items():
        samp = np.asarray(sample_model(cfg, trainer.model, state.params, n_post,
                                       jax.random.PRNGKey(900+i), y_target=y_t))
        ok = np.isfinite(samp).all(axis=1) & (np.abs(samp).max(axis=1) < 1e3)
        samp = samp[ok]
        res[name]["mmds"].append(float(multi_mmd(jnp.asarray(samp), jnp.asarray(gt[:len(samp)]))))
    print(i, {n: round(res[n]["mmds"][-1],4) for n in res}, flush=True)

summary = {name: dict(posterior_mmd_mean=float(np.mean(r["mmds"])),
                      posterior_mmd_std=float(np.std(r["mmds"])))
           for name, r in res.items()}
with open("artifacts/plus_conditional_abc.json", "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary, indent=2))
