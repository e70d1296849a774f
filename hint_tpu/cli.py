"""Command-line interface.

The reference has no CLI: runs are selected by un-commenting import lines
(/root/reference/train_unconditional.py:10-35) or editing config-name lists
and ``exec``-importing them (run_experiments.py:97-102). Here:

    python -m hint_tpu list [prefix]
    python -m hint_tpu train    --config plus_shape.unconditional_hint_4_full
    python -m hint_tpu evaluate --config ... --ckpt results/run.npz
    python -m hint_tpu sample   --config ... --ckpt ... --n 1000 --out s.npy
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--config", required=True, help="registry name, e.g. plus_shape.unconditional_hint_4_full")
    p.add_argument("--uci-root", default=".", help="directory containing uci_data/")
    p.add_argument("--cache-dir", default="data", help="toy-data npy cache directory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="matmul compute dtype (params stay float32)")
    p.add_argument("--impl", default="levelwise", choices=["levelwise", "reference", "fused"],
                   help="HAC engine ('fused' = whole-block Pallas kernel, the "
                        "inference engine; 'reference' = recursion-order oracle)")
    p.add_argument("--remat", action="store_true",
                   help="enable activation rematerialization (off by default: the "
                        "on-chip A/B measured it 11-17%% slower at this model scale; "
                        "useful only when HBM is the binding constraint - docs/perf.md)")
    p.add_argument("--no-remat", action="store_true", help=argparse.SUPPRESS)  # legacy no-op
    p.add_argument("--scan-blocks", default="auto", choices=["auto", "on", "off"],
                   help="lax.scan over repeated blocks (single-lane inn/hint "
                        "chains): compile time O(1) in depth, math identical "
                        "to the unrolled build. 'auto' = on for n_blocks >= 16")
    p.add_argument("--lr-semantics", default="legacy", choices=["legacy", "modern"],
                   help="post-warmup StepLR behavior: 'legacy' = torch-1.x closed form "
                        "(the schedule the reference was written against), 'modern' = "
                        "torch>=1.4 chainable semantics the reference executes today "
                        "(~28x lower post-warmup lr; see train/optim.py)")



def _scan_blocks_arg(args):
    """Translate the --scan-blocks tri-state into the Config API's
    Optional[bool] (None = auto: scan when n_blocks >= 16)."""
    return {"auto": None, "on": True, "off": False}[getattr(args, "scan_blocks", "auto")]

def cmd_list(args):
    from hint_tpu.configs import list_configs

    for name in list_configs(args.prefix):
        print(name)


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from hint_tpu.configs import get_config
    from hint_tpu.monitor import ConsoleMonitor
    from hint_tpu.train import checkpoint

    cfg = get_config(args.config)
    overrides = {}
    if args.epochs:
        overrides["n_epochs"] = args.epochs
    if args.n_train:
        overrides["n_train"] = args.n_train
    if args.n_test:
        overrides["n_test"] = args.n_test
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.max_batches:
        overrides["max_batches_per_epoch"] = args.max_batches
    if overrides:
        cfg = type(cfg)(**{**cfg.__dict__, **overrides})
    print(f"config: {cfg.name} (suffix {cfg.suffix})")
    (x_tr, y_tr), (x_te, y_te) = cfg.load_data(args.cache_dir, args.uci_root)
    trainer = cfg.make_trainer(compute_dtype=args.dtype, impl=args.impl, lr_semantics=args.lr_semantics, remat=getattr(args, "remat", False), scan_blocks=_scan_blocks_arg(args))
    if args.plot_dir:
        from hint_tpu.monitor import make_monitor

        monitor = make_monitor(
            interactive=True, plot_dir=args.plot_dir,
            data_model=cfg.data_model() if not cfg.is_uci else None,
            y_target=cfg.vis_y_target if cfg.is_conditional else None,
        )
    else:
        monitor = ConsoleMonitor()
    state_probe = trainer.init_state(jax.random.PRNGKey(args.seed))
    print(f"\nModel {cfg.suffix} has {trainer.n_trainable_params(state_probe):,} trainable parameters.\n")

    ckpt_fn = None
    if args.save:
        def ckpt_fn(state, epoch):
            if (epoch + 1) % args.save_every == 0 or epoch + 1 == cfg.n_epochs:
                checkpoint.save_npz(args.save, state, model=trainer.model)

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile_dir:
        from hint_tpu.utils import profile_trace

        prof = profile_trace(args.profile_dir)
    resume_state = None
    if args.resume:
        template = trainer.init_state(jax.random.PRNGKey(args.seed))
        resume_state = checkpoint.load_npz(args.resume, template, model=trainer.model)
        print(f"resuming from {args.resume} at epoch {int(resume_state.epoch)}")

    with prof:
        state, final = trainer.fit(
            jax.random.PRNGKey(args.seed),
            (jnp.asarray(x_tr), jnp.asarray(y_tr) if cfg.is_conditional else None),
            (jnp.asarray(x_te), jnp.asarray(y_te) if cfg.is_conditional else None),
            monitor=monitor,
            full_batch_test=cfg.is_uci,
            checkpoint_fn=ckpt_fn,
            resume_state=resume_state,
        )
    print(f"final test loss: {final:.6f}")
    if cfg.is_uci:
        d = cfg.ndim_x
        ll = -final - (d / 2) * np.log(2 * np.pi)  # run_uci_experiments.py:71-72
        print(f"test log-likelihood: {ll:.3f} nats")
    if args.save:
        checkpoint.save_npz(args.save, state, model=trainer.model)
        print(f"saved checkpoint to {args.save}")
    return final


def cmd_evaluate(args):
    import jax
    import jax.numpy as jnp

    from hint_tpu.configs import get_config
    from hint_tpu.train import checkpoint

    cfg = get_config(args.config)
    (_, _), (x_te, y_te) = cfg.load_data(args.cache_dir, args.uci_root)
    trainer = cfg.make_trainer(compute_dtype=args.dtype, impl=args.impl, lr_semantics=args.lr_semantics, remat=getattr(args, "remat", False), scan_blocks=_scan_blocks_arg(args))
    template = trainer.init_state(jax.random.PRNGKey(args.seed))
    state = checkpoint.load_npz(args.ckpt, template, model=trainer.model)
    losses, nll_x = trainer.eval_epoch(
        state.params,
        jnp.asarray(x_te),
        jnp.asarray(y_te) if cfg.is_conditional else None,
        jax.random.PRNGKey(args.seed + 1),
        full_batch=cfg.is_uci,
        return_nll_x=True,
    )
    total = float(losses.sum())
    print(f"test loss: {total:.6f}  terms: {losses}")
    if np.isfinite(nll_x):  # two-lane models: x-lane NLL (train_conditional.py:134)
        print(f"x-lane NLL: {nll_x:.6f}")
    print(f"per-dim likelihood: {-total / cfg.ndim_x:.4f}")  # run_experiments.py:210
    if cfg.is_uci:
        print(f"log-likelihood: {-total - (cfg.ndim_x / 2) * np.log(2 * np.pi):.3f} nats")
    return total


def cmd_sample(args):
    import jax
    import jax.numpy as jnp

    from hint_tpu.configs import get_config
    from hint_tpu.evaluation.sampling import sample_model
    from hint_tpu.train import checkpoint

    cfg = get_config(args.config)
    trainer = cfg.make_trainer(compute_dtype=args.dtype, impl=args.impl, lr_semantics=args.lr_semantics, remat=getattr(args, "remat", False), scan_blocks=_scan_blocks_arg(args))
    template = trainer.init_state(jax.random.PRNGKey(args.seed))
    state = checkpoint.load_npz(args.ckpt, template, model=trainer.model)
    y_target = None
    if cfg.is_conditional:
        y_target = args.y_target or cfg.vis_y_target
        if y_target is None:
            sys.exit("conditional config: pass --y-target")
    x = sample_model(
        cfg, trainer.model, state.params, args.n, jax.random.PRNGKey(args.seed + 2), y_target
    )
    np.save(args.out, np.asarray(x))
    print(f"saved {args.n} samples to {args.out}")


def cmd_serve(args):
    from hint_tpu.serve import InferenceService, serve

    svc = InferenceService.from_checkpoint(args.config, args.ckpt, impl=args.impl,
                                           compute_dtype=args.dtype)
    print("warming up (compiling all buckets)...")
    svc.warmup()
    serve(svc, args.host, args.port)


def cmd_experiment(args):
    from hint_tpu import experiments
    from hint_tpu.monitor import ConsoleMonitor

    monitor = ConsoleMonitor() if args.verbose else None
    if args.what == "shapes":
        experiments.train_and_evaluate(
            args.configs, n_runs=args.runs, n_eval_samples=args.n_eval_samples,
            results_dir=args.results_dir, cache_dir=args.cache_dir,
            uci_root=args.uci_root, seed=args.seed, monitor=monitor,
        )
    elif args.what == "uci":
        configs = args.configs or None
        kwargs = dict(
            n_runs=args.runs, results_dir=args.results_dir, uci_root=args.uci_root,
            seed=args.seed, monitor=monitor,
        )
        if configs:
            experiments.uci_train_and_eval(configs, **kwargs)
        else:
            experiments.uci_train_and_eval(**kwargs)
    elif args.what == "collect-uci":
        if args.configs:
            experiments.uci_collect_results(args.configs, results_dir=args.results_dir)
        else:
            experiments.uci_collect_results(results_dir=args.results_dir)
    elif args.what == "collect-shapes":
        experiments.collect_shape_results(args.configs, n_runs=args.runs, results_dir=args.results_dir)
    elif args.what == "eval-shapes":
        experiments.eval_shapes(args.configs, results_dir=args.results_dir)
    elif args.what == "likelihood":
        experiments.test_likelihood(
            args.configs, n_runs=args.runs, results_dir=args.results_dir,
            cache_dir=args.cache_dir, uci_root=args.uci_root, seed=args.seed,
        )
    else:
        sys.exit(f"unknown experiment {args.what!r}")


def main(argv=None):
    from hint_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # persistent XLA cache + JAX_PLATFORMS re-assert
    ap = argparse.ArgumentParser(prog="hint_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("list", help="list registered configs")
    p.add_argument("prefix", nargs="?", default="")
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("train", help="train a config")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=0, help="override n_epochs")
    p.add_argument("--n-train", type=int, default=0, help="override n_train (toy data)")
    p.add_argument("--n-test", type=int, default=0, help="override n_test (toy data)")
    p.add_argument("--batch-size", type=int, default=0, help="override batch_size")
    p.add_argument("--max-batches", type=int, default=0, help="override max_batches_per_epoch")
    p.add_argument("--save", default="", help="checkpoint path (.npz)")
    p.add_argument("--save-every", type=int, default=10)
    p.add_argument("--plot-dir", default="", help="write live loss/latent/sample PNGs here")
    p.add_argument("--profile-dir", default="", help="capture a jax.profiler trace here")
    p.add_argument("--resume", default="", help="resume exactly from a .npz checkpoint")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="evaluate a checkpoint")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("sample", help="draw samples from a checkpoint")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--y-target", type=float, nargs="*", default=None)
    p.add_argument("--out", default="samples.npy")
    p.set_defaults(fn=cmd_sample)

    p = sub.add_parser("serve", help="HTTP sample/log_prob service over a checkpoint")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "experiment",
        help="sweep drivers (reference run_experiments / run_uci_experiments / eval_shapes)",
    )
    p.add_argument(
        "what",
        choices=["shapes", "uci", "collect-uci", "collect-shapes", "eval-shapes", "likelihood"],
    )
    p.add_argument("configs", nargs="*", help="registry config names")
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--n-eval-samples", type=int, default=1000)
    p.add_argument("--results-dir", default="results")
    p.add_argument("--cache-dir", default="data")
    p.add_argument("--uci-root", default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.set_defaults(fn=cmd_experiment)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
