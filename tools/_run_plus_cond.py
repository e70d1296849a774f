"""Plus-shape conditional HINT (d=100 two-lane) + cINN on TPU: train, save,
conditional figure with condition overlay."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
from hint_tpu.configs import get_config
import hint_tpu.configs.registry_data as rd
from hint_tpu.utils import enable_compilation_cache
from hint_tpu.train import checkpoint
enable_compilation_cache()
os.makedirs("artifacts", exist_ok=True)

NAMES = ("plus_shape.conditional_hint_4_full", "plus_shape.conditional_cinn_4")
for name in NAMES:
    rd.CONFIGS[name] = {**rd.CONFIGS[name], "n_train": 100000, "n_test": 10000}

out = {}
for name in NAMES:
    cfg = get_config(name)
    (xtr, ytr), (xte, yte) = cfg.load_data("data")
    trainer = cfg.make_trainer()
    ck = f"artifacts/{name.replace('.','-')}.npz"
    t0 = time.time()
    if os.path.exists(ck):
        template = trainer.init_state(jax.random.PRNGKey(0))
        state = checkpoint.load_npz(ck, template)
        final = float(trainer.eval_epoch(state.params, jnp.asarray(xte), jnp.asarray(yte),
                                         jax.random.PRNGKey(1)).sum())
    else:
        state, final = trainer.fit(jax.random.PRNGKey(0),
                                   (jnp.asarray(xtr), jnp.asarray(ytr)),
                                   (jnp.asarray(xte), jnp.asarray(yte)))
        checkpoint.save_npz(ck, state)
    mins = (time.time()-t0)/60
    out[name] = dict(final_test_loss=float(final), minutes=mins)
    print(name, out[name], flush=True)
    with open("artifacts/plus_conditional_results.json", "w") as f:
        json.dump(out, f, indent=2)
    try:
        from hint_tpu.monitor import figures
        figures.plot_model_conditional(cfg, trainer.model, state.params,
                                       jax.random.PRNGKey(9), n_samples=1000,
                                       out_dir="artifacts", cache_dir="data")
        print("figure done", flush=True)
    except Exception as e:
        print("figure failed:", repr(e), flush=True)
print(json.dumps(out, indent=2))
