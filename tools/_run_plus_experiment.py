"""Flagship plus-shape experiment on TPU: train unconditional HINT-4-full,
sample, batch shape-fit scoring, figure, JSON summary."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp

from hint_tpu.configs import get_config
import hint_tpu.configs.registry_data as rd
from hint_tpu.utils import enable_compilation_cache
enable_compilation_cache()

os.makedirs("artifacts", exist_ok=True)
NAMES = ("plus_shape.unconditional_hint_4_full", "plus_shape.unconditional_inn_4")
for name in NAMES:
    rd.CONFIGS[name] = {**rd.CONFIGS[name], "n_train": 100000, "n_test": 10000}

results = {}
for name in NAMES:
    cfg = get_config(name)
    (xtr, _), (xte, _) = cfg.load_data("data")
    corr_path = f"data/{cfg.data_model().name}_corr.npy"
    if not os.path.exists(corr_path):
        np.save(corr_path, np.corrcoef(xtr.T))
    trainer = cfg.make_trainer()
    ckpt_path = f"artifacts/{name.replace('.','-')}.npz"
    t0 = time.time()
    if os.path.exists(ckpt_path):
        from hint_tpu.train import checkpoint as _ck
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = _ck.load_npz(ckpt_path, template)
        final = float(trainer.eval_epoch(state.params, jnp.asarray(xte), None,
                                         jax.random.PRNGKey(1)).sum())
    else:
        state, final = trainer.fit(jax.random.PRNGKey(0), (jnp.asarray(xtr), None),
                                   (jnp.asarray(xte), None))
    mins = (time.time()-t0)/60
    per_dim = -final / cfg.ndim_x
    print(f"{name}: final loss {final:.3f}, per-dim LL {per_dim:.4f}, {mins:.1f} min", flush=True)

    from hint_tpu.evaluation.sampling import sample_model
    from hint_tpu.evaluation.mmd import multi_mmd
    from hint_tpu.evaluation import shape_fit
    t0 = time.time()
    x_samp = np.asarray(sample_model(cfg, trainer.model, state.params, 4000, jax.random.PRNGKey(7)))
    samp_s = time.time()-t0
    ok_rows = np.isfinite(x_samp).all(axis=1) & (np.abs(x_samp).max(axis=1) < 1e3)
    x_ok = x_samp[ok_rows]
    print(f"samples kept for MMD: {ok_rows.sum()}/4000")
    mmds = []
    rng = np.random.default_rng(0)
    for _ in range(10):
        sel = rng.choice(xte.shape[0], 2000, replace=False)
        sel2 = rng.choice(len(x_ok), 2000, replace=len(x_ok) < 2000)
        mmds.append(float(multi_mmd(jnp.asarray(x_ok[sel2]), jnp.asarray(xte[sel]))))
    dm = cfg.data_model()
    from hint_tpu.experiments.drivers import _score_shapes
    t0 = time.time()
    metrics4 = _score_shapes(dm, x_samp[:50], "plus")
    fit_s = time.time()-t0
    per = metrics4[None, :]
    results[name] = dict(final_test_loss=float(final), per_dim_ll=float(per_dim),
                         minutes=mins, sample_seconds_4000=samp_s,
                         mmd_mean=float(np.mean(mmds)), mmd_std=float(np.std(mmds)),
                         iou=float(per[:,0].mean()), dice=float(per[:,1].mean()),
                         max_h=float(per[:,2].mean()), avg_h=float(per[:,3].mean()),
                         batch_fit_seconds_50=fit_s)
    print(name, results[name], flush=True)
    from hint_tpu.train import checkpoint
    checkpoint.save_npz(f"artifacts/{name.replace('.','-')}.npz", state)
    with open("artifacts/plus_results.json", "w") as f:
        json.dump(results, f, indent=2)
    try:
        from hint_tpu.monitor import figures
        figures.plot_model_unconditional(cfg, trainer.model, state.params,
                                         jax.random.PRNGKey(9), n_samples=4000,
                                         out_dir="artifacts", cache_dir="data")
    except Exception as e:
        print("figure failed:", e)

with open("artifacts/plus_results.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results, indent=2))
