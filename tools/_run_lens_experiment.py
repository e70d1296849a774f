"""End-to-end lens-shape experiment on the real TPU: train unconditional
HINT + INN, score shapes, MMD vs held-out prior, save figures + RESULTS.md."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp

from hint_tpu.configs import get_config
import hint_tpu.configs.registry_data as rd
from hint_tpu.utils import enable_compilation_cache
enable_compilation_cache()

os.makedirs("artifacts", exist_ok=True)

# moderate-scale run: 100k train / 10k test (data gen is host-bound at 1 core)
for name in ("lens_shape.unconditional_hint_1_full", "lens_shape.unconditional_inn_1"):
    rd.CONFIGS[name] = {**rd.CONFIGS[name], "n_train": 100000, "n_test": 10000}

results = {}
for name in ("lens_shape.unconditional_hint_1_full", "lens_shape.unconditional_inn_1"):
    cfg = get_config(name)
    (xtr, ytr), (xte, yte) = cfg.load_data("data")
    trainer = cfg.make_trainer()
    t0 = time.time()
    state, final = trainer.fit(jax.random.PRNGKey(0), (jnp.asarray(xtr), None),
                               (jnp.asarray(xte), None))
    mins = (time.time()-t0)/60
    per_dim = -final / cfg.ndim_x
    print(f"{name}: final test loss {final:.4f}, per-dim LL {per_dim:.4f}, {mins:.1f} min")

    from hint_tpu.evaluation.sampling import sample_model
    from hint_tpu.evaluation.mmd import multi_mmd
    from hint_tpu.evaluation import shape_fit
    x_samp = np.asarray(sample_model(cfg, trainer.model, state.params, 4000, jax.random.PRNGKey(7)))
    # MMD vs held-out test prior samples
    mmds = []
    rng = np.random.default_rng(0)
    for _ in range(10):
        sel = rng.choice(xte.shape[0], 2000, replace=False)
        sel2 = rng.choice(4000, 2000, replace=False)
        mmds.append(float(multi_mmd(jnp.asarray(x_samp[sel2]), jnp.asarray(xte[sel]))))
    # shape metrics on 100 sampled curves
    dm = cfg.data_model()
    coeffs = dm.unflatten_coeffs(x_samp[:100])
    curves = dm.trace_fourier_curves(coeffs).astype(np.float32)
    dense = dm.trace_fourier_curves(coeffs, n_points=1000)
    params_fit = shape_fit.fit_lens_shapes_batch(curves)
    per = [shape_fit.iou_and_dice_lens(params_fit[j], curves[j]) +
           shape_fit.hausdorff_lens(params_fit[j], dense[j]) for j in range(100)]
    per = np.asarray(per)
    results[name] = dict(
        final_test_loss=float(final), per_dim_ll=float(per_dim), minutes=mins,
        mmd_mean=float(np.mean(mmds)), mmd_std=float(np.std(mmds)),
        iou=float(per[:,0].mean()), dice=float(per[:,1].mean()),
        max_h=float(per[:,2].mean()), avg_h=float(per[:,3].mean()),
    )
    print(name, results[name])
    from hint_tpu.train import checkpoint
    checkpoint.save_npz(f"artifacts/{name.replace('.','-')}.npz", state)
    # sample figure
    from hint_tpu.monitor import figures
    figures.plot_model_unconditional(cfg, trainer.model, state.params,
                                     jax.random.PRNGKey(9), limits=(-2.5,2.5,-2.5,2.5),
                                     n_samples=4000, out_dir="artifacts", cache_dir="data")

with open("artifacts/lens_results.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results, indent=2))
