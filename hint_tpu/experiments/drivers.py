"""Experiment sweep drivers.

Functional re-design of the reference's three driver scripts, which select
work by editing commented-out config-name lists and ``exec``-importing
modules (/root/reference/run_experiments.py:12-102,
run_uci_experiments.py:11-35, eval_shapes.py:11-69). Here every driver takes
an explicit config-name list and directories, and is exposed through the
CLI (``python -m hint_tpu experiment ...``).

Reference behaviors kept:

* per-config swallow-and-continue error handling (run_experiments.py:169-173);
* results layout: ``results/{config-with-dashes}_{i}.npz`` checkpoints,
  ``..._{i}_sample.npy`` unflattened-coefficient samples,
  ``..._{i}.npy`` metric stacks, ``results/{config-with-dashes}.npy`` UCI
  loss arrays (run_experiments.py:113,142,167; run_uci_experiments.py:53);
* lens configs are shape-scored inline after training, plus configs via the
  separate ``eval_shapes`` pass (run_experiments.py:144-167, eval_shapes.py);
* ``test_likelihood``: per-dim likelihood of reloaded checkpoints plus
  correlation-matrix MSE against cached ground truth
  (run_experiments.py:192-236);
* UCI log-likelihood conversion LL = −loss − (d/2)·ln 2π
  (run_uci_experiments.py:71-72).

TPU-first deltas: samples are drawn by one jitted inverse pass; shape
scoring uses the vmapped batch fitters (hint_tpu.evaluation.shape_fit) —
one device program for all curves instead of a Python loop per curve.
"""

from __future__ import annotations

import os
import traceback
from typing import Dict, Optional, Sequence

import numpy as np


def _dash(config: str) -> str:
    return config.replace(".", "-")


def _train_one(config: str, seed: int, cache_dir: str, uci_root: str, monitor=None):
    """Train one config once; returns (cfg, trainer, state, final_test_loss)."""
    import jax
    import jax.numpy as jnp

    from hint_tpu.configs import get_config

    cfg = get_config(config)
    (x_tr, y_tr), (x_te, y_te) = cfg.load_data(cache_dir, uci_root)
    trainer = cfg.make_trainer()
    state, final = trainer.fit(
        jax.random.PRNGKey(seed),
        (jnp.asarray(x_tr), jnp.asarray(y_tr) if cfg.is_conditional else None),
        (jnp.asarray(x_te), jnp.asarray(y_te) if cfg.is_conditional else None),
        monitor=monitor,
        full_batch_test=cfg.is_uci,
    )
    return cfg, trainer, state, final


def _draw_sample(cfg, trainer, state, n: int, seed: int) -> np.ndarray:
    import jax

    from hint_tpu.evaluation.sampling import sample_model

    return np.asarray(
        sample_model(
            cfg, trainer.model, state.params, n, jax.random.PRNGKey(seed),
            y_target=cfg.vis_y_target if cfg.is_conditional else None,
        )
    )


def _score_shapes(data_model, sample_flat: np.ndarray, family: str, mesh=None) -> np.ndarray:
    """Mean [IoU, DICE, max_h, avg_h] over sampled curves using the vmapped
    batch fitters."""
    from hint_tpu.data import geometry
    from hint_tpu.evaluation import shape_fit

    coeffs = data_model.unflatten_coeffs(sample_flat)
    curves = data_model.trace_fourier_curves(coeffs).astype(np.float32)
    dense = data_model.trace_fourier_curves(coeffs, n_points=1000)
    # drop curves an undertrained flow mapped to non-finite/degenerate coords
    # (inverse through stacked exp-couplings can overflow for outlier z)
    ok = np.isfinite(curves).all(axis=(1, 2)) & (np.abs(curves).max(axis=(1, 2)) < 1e3)
    n_dropped = int((~ok).sum())
    if n_dropped:
        print(f"shape scoring: dropped {n_dropped}/{len(ok)} non-finite/degenerate curves")
    curves, dense = curves[ok], dense[ok]
    if len(curves) == 0:
        print("shape scoring: no scoreable curves (all dropped as non-finite)")
        return np.full(4, np.nan)
    if family == "lens":
        params = shape_fit.fit_lens_shapes_batch(curves, mesh=mesh)
    else:
        params = shape_fit.fit_plus_shapes_batch(curves, mesh=mesh)
    fit_ok = np.isfinite(params).all(axis=1)  # all restarts diverged otherwise
    if not fit_ok.any():
        print("shape scoring: no scoreable curves (all dropped or diverged)")
        return np.full(4, np.nan)
    params, curves, dense = params[fit_ok], curves[fit_ok], dense[fit_ok]
    # outlines in one jitted call, IoU/DICE rasterized on the accelerator
    # (the per-curve eager-call + host-raster path costs ~1 s/curve; see
    # shape_fit batched-scoring note); Hausdorff stays host-side (cheap).
    if family == "lens":
        outlines = shape_fit.lens_outlines_batch(params)
        dense_outline = lambda o: o
    else:
        from hint_tpu.data.fourier import PlusShapeModel

        _pm = PlusShapeModel()
        outlines = shape_fit.plus_outlines_batch(params)
        dense_outline = lambda o: _pm.densify_polyline(o, max_dist=0.02)
    iou, dice = shape_fit.iou_and_dice_batch(outlines, curves, mesh=mesh)
    haus = np.asarray(
        [geometry.hausdorff(dense_outline(outlines[j]), dense[j]) for j in range(len(curves))]
    )
    arr = np.concatenate([iou[:, None], dice[:, None], haus], axis=1)
    return arr.mean(axis=0)


def train_and_evaluate(
    configs: Sequence[str],
    n_runs: int = 1,
    n_eval_samples: int = 1000,
    results_dir: str = "results",
    cache_dir: str = "data",
    uci_root: str = ".",
    seed: int = 0,
    monitor=None,
) -> Dict[str, list]:
    """Toy-shape sweep: train, checkpoint, sample, score lens shapes inline
    (run_experiments.py:97-173)."""
    from hint_tpu.train import checkpoint

    os.makedirs(results_dir, exist_ok=True)
    outcomes: Dict[str, list] = {}
    for config in configs:
        outcomes[config] = []
        for i in range(n_runs):
            try:
                cfg, trainer, state, final = _train_one(
                    config, seed + i, cache_dir, uci_root, monitor
                )
                checkpoint.save_npz(
                    os.path.join(results_dir, f"{_dash(config)}_{i}.npz"), state,
                    model=trainer.model,
                )
                sample = _draw_sample(cfg, trainer, state, n_eval_samples, seed + 1000 + i)
                data_model = cfg.data_model()
                np.save(
                    os.path.join(results_dir, f"{_dash(config)}_{i}_sample.npy"),
                    data_model.unflatten_coeffs(sample),
                )
                print(config, i, "test loss:", final)
                if "lens" in config:
                    metrics = _score_shapes(data_model, sample, "lens")
                    print(config, i, "IoU/DICE/max_h/avg_h:", metrics)
                    np.save(os.path.join(results_dir, f"{_dash(config)}_{i}.npy"), metrics)
                outcomes[config].append(final)
            except Exception:
                print(f'ERROR with config "{config}"', i)
                traceback.print_exc()
    return outcomes


def collect_shape_results(
    configs: Sequence[str], n_runs: int = 1, results_dir: str = "results"
) -> Dict[str, tuple]:
    """mean ± std of [IoU, DICE, max_h, avg_h] over runs
    (run_experiments.py:177-188)."""
    out = {}
    for config in configs:
        rs = np.array(
            [np.load(os.path.join(results_dir, f"{_dash(config)}_{i}.npy")) for i in range(n_runs)]
        )
        means, stds = rs.mean(axis=0), rs.std(axis=0)
        out[config] = (means, stds)
        print(config)
        print(f"{means[0]:.3f} \\pm {stds[0]:.3f} & {means[3]:.3f} \\pm {stds[3]:.3f}\n")
    return out


def test_likelihood(
    configs: Sequence[str],
    n_runs: int = 1,
    results_dir: str = "results",
    cache_dir: str = "data",
    uci_root: str = ".",
    seed: int = 0,
) -> Dict[str, tuple]:
    """Per-dim likelihood + correlation MSE of saved checkpoints
    (run_experiments.py:192-236)."""
    import jax
    import jax.numpy as jnp

    from hint_tpu.configs import get_config
    from hint_tpu.evaluation.metrics import correlation_mse
    from hint_tpu.evaluation.sampling import sample_model
    from hint_tpu.train import checkpoint

    out = {}
    for config in configs:
        try:
            cfg = get_config(config)
            (_, _), (x_te, y_te) = cfg.load_data(cache_dir, uci_root)
            trainer = cfg.make_trainer()
            template = trainer.init_state(jax.random.PRNGKey(seed))
            likelihoods, corr_mses = [], []
            for i in range(n_runs):
                state = checkpoint.load_npz(
                    os.path.join(results_dir, f"{_dash(config)}_{i}.npz"), template,
                    model=trainer.model,
                )
                losses = trainer.eval_epoch(
                    state.params,
                    jnp.asarray(x_te),
                    jnp.asarray(y_te) if cfg.is_conditional else None,
                    jax.random.PRNGKey(seed + 1 + i),
                    full_batch=cfg.is_uci,
                )
                likelihoods.append(-float(losses.sum()) / cfg.data_model().n_parameters)
                n = 4000 if cfg.is_conditional else 10000
                sample = np.asarray(
                    sample_model(
                        cfg, trainer.model, state.params, n,
                        jax.random.PRNGKey(seed + 2000 + i),
                        y_target=cfg.vis_y_target if cfg.is_conditional else None,
                    )
                )
                suffix = "_corr_conditional" if cfg.is_conditional else "_corr"
                corr_true = np.load(
                    os.path.join(cache_dir, f"{cfg.data_model().name}{suffix}.npy")
                )
                corr_mses.append(correlation_mse(sample, corr_true))
            out[config] = (
                (float(np.mean(likelihoods)), float(np.std(likelihoods))),
                (float(np.mean(corr_mses)), float(np.std(corr_mses))),
            )
            print(config)
            print(f"{np.mean(likelihoods):.3f} \\pm {np.std(likelihoods):.3f}")
            print(f"{np.mean(corr_mses):.4f} \\pm {np.std(corr_mses):.4f}\n")
        except Exception:
            print(f'ERROR with config "{config}"')
            traceback.print_exc()
    return out


UCI_CONFIGS = (
    "uci_data.power_hint_4", "uci_data.power_hint_8",
    "uci_data.power_inn_4", "uci_data.power_inn_8",
    "uci_data.gas_hint_4", "uci_data.gas_hint_8",
    "uci_data.gas_inn_4", "uci_data.gas_inn_8",
    "uci_data.miniboone_hint_4", "uci_data.miniboone_hint_8",
    "uci_data.miniboone_inn_4", "uci_data.miniboone_inn_8",
)  # run_uci_experiments.py:11-25


def uci_train_and_eval(
    configs: Sequence[str] = UCI_CONFIGS,
    n_runs: int = 3,
    results_dir: str = "results",
    uci_root: str = ".",
    seed: int = 0,
    monitor=None,
) -> Dict[str, np.ndarray]:
    """UCI benchmark sweep (run_uci_experiments.py:29-53)."""
    from hint_tpu.train import checkpoint

    os.makedirs(results_dir, exist_ok=True)
    out = {}
    for config in configs:
        test_losses = []
        for i in range(n_runs):
            try:
                cfg, trainer, state, final = _train_one(config, seed + i, "data", uci_root, monitor)
                checkpoint.save_npz(os.path.join(results_dir, f"{_dash(config)}_{i}.npz"), state, model=trainer.model)
                test_losses.append(final)
            except Exception:
                print(f'ERROR with config "{config}"', i)
                traceback.print_exc()
        print(config)
        print(test_losses)
        np.save(os.path.join(results_dir, f"{_dash(config)}.npy"), np.array(test_losses))
        out[config] = np.array(test_losses)
    return out


def uci_collect_results(
    configs: Sequence[str] = UCI_CONFIGS, results_dir: str = "results"
) -> Dict[str, tuple]:
    """LL = −loss − (d/2)·ln 2π, mean ± std over runs
    (run_uci_experiments.py:57-76)."""
    from hint_tpu.configs import get_config

    out = {}
    for config in configs:
        d = get_config(config).ndim_x
        lls = -np.load(os.path.join(results_dir, f"{_dash(config)}.npy"))
        lls -= np.log(2 * np.pi) * (d / 2)
        out[config] = (float(lls.mean()), float(lls.std()))
        print(config)
        print(f"{lls.mean():.3f} \\pm {lls.std():.3f}\n")
    return out


def eval_shapes(
    configs: Sequence[str],
    run_index: int = 0,
    results_dir: str = "results",
) -> Dict[str, np.ndarray]:
    """Score saved plus-shape samples (eval_shapes.py:67-121); the reference's
    mp.Pool(1)-over-configs becomes a vmapped batch fit per config."""
    from hint_tpu.data.fourier import PlusShapeModel

    data_model = PlusShapeModel()
    out = {}
    for config in configs:
        try:
            sample = np.load(
                os.path.join(results_dir, f"{_dash(config)}_{run_index}_sample.npy")
            )
            flat = data_model.flatten_coeffs(sample)
            metrics = _score_shapes(data_model, flat, "plus")
            print(config, "IoU/DICE/max_h/avg_h:", metrics)
            np.save(os.path.join(results_dir, f"{_dash(config)}_{run_index}.npy"), metrics)
            out[config] = metrics
        except Exception:
            print(f'ERROR with config "{config}"')
            traceback.print_exc()
    return out
