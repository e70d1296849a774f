"""ABC / rejection-sampling baseline and model-comparison harness.

Re-design of /root/reference/rejection_sampling.py. The reference draws 1e8
prior samples in a single-process Python loop ("will take some time",
README.md:40), computes quantile-ABC posteriors with scipy on one core, and
runs MMD on CUDA. Here:

* the prior sweep is parallel over host CPU cores (shape generation is
  shapely-free numpy, embarrassingly parallel — SURVEY.md §3.4);
* quantile-ABC's nearest-n search runs chunked on the accelerator via
  ``lax.top_k`` (negated distances), streaming the 1e8-row observation
  table through HBM;
* MMD is the jitted ``hint_tpu.evaluation.mmd.multi_mmd``;
* model comparison takes explicit (name → sampler) mappings instead of the
  reference's exec-import of config modules (rejection_sampling.py:20-30).

Cache layout matches the reference so results are interchangeable:
``abc/{name}_{x,y}_huge.npy``, ``abc/{name}/{i:05}.pkl``,
``abc/{name}_{un,}conditional_comparison_{run}.pkl``.
"""

from __future__ import annotations

import functools
import os
import pickle
import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

ArrayPair = Tuple[np.ndarray, np.ndarray]

# Disjoint seed space for the ABC prior pool (train=0 / test=1 streams live
# at small seeds — see prepare_samples below and data/loaders.py:65).
ABC_SEED_OFFSET = 0x5EED0000


# -- prior sweep -------------------------------------------------------------------


def _sample_chunk(args):
    model_factory, n, seed, engine, sub_batch = args
    model = model_factory()
    if engine == "tpu":
        # batched accelerator sweep: minutes instead of hours at pool
        # scale; runs in-process (no fork — JAX state isn't fork-safe),
        # chunk-deterministic in its PRNGKey seed
        kw = {} if sub_batch is None else {"sub_batch": sub_batch}
        if model.name == "lens-shape1":
            from hint_tpu.data import lens_tpu

            return lens_tpu.sample_joint(n, seed=seed, **kw)
        if model.name == "plus-shape":
            from hint_tpu.data import plus_tpu

            return plus_tpu.sample_joint(n, seed=seed, **kw)
        raise NotImplementedError(
            f"engine='tpu' supports lens/plus families, got {model.name}"
        )
    if engine in ("auto", "native"):
        try:
            from hint_tpu.data import native

            # native sample_joint = prior + forward process in one pass
            return native.sample_joint(model.name, n, seed=seed)
        except Exception as e:
            if engine == "native":
                raise
            print(f"native generator unavailable ({e!r}); numpy fallback "
                  f"(15-65x slower)")
    np.random.seed(seed)
    x = model.sample_prior(n).astype(np.float32)
    y = model.forward_process(x).astype(np.float32)
    return x, y


def prepare_samples(
    model_factory: Callable,
    n_total: int = int(1e8),
    out_dir: str = "abc",
    chunk: int = 10_000,
    n_workers: Optional[int] = None,
    seed: int = 0,
    engine: str = "auto",
    sub_batch: Optional[int] = None,
) -> ArrayPair:
    """Draw ``n_total`` prior samples + observations in parallel and cache to
    ``abc/{name}_{x,y}_huge.npy`` (rejection_sampling.py:76-85).

    ``model_factory`` must be picklable (the class itself works).
    ``engine="auto"`` uses the C++ generator (hint_tpu/native) when it
    builds — 15-65x faster per sample than the numpy pipeline.
    """
    import multiprocessing as mp

    model = model_factory()
    fx = os.path.join(out_dir, f"{model.name}_x_huge.npy")
    fy = os.path.join(out_dir, f"{model.name}_y_huge.npy")
    if os.path.exists(fx) and os.path.exists(fy):
        x = np.load(fx, mmap_mode="r")
        if x.shape[0] >= n_total:
            return np.load(fx, mmap_mode="r"), np.load(fy, mmap_mode="r")
    os.makedirs(out_dir, exist_ok=True)
    if engine in ("auto", "native"):  # build once in the parent, not per fork
        try:
            from hint_tpu.data import native

            native.load()
        except Exception:
            pass
    n_chunks = max(1, -(-n_total // chunk))  # ceil: never under-generate
    if n_chunks * chunk != n_total:
        # memmap rows are written at i*chunk offsets; a ragged last chunk
        # would silently truncate — round the pool up instead
        n_total = n_chunks * chunk
    # Seed space is offset away from the training/test streams:
    # prepare_toy_data draws train with seed 0 and test with seed 1, so chunk
    # seeds starting at `seed + 0` would make the ABC "ground-truth" pool
    # contain the exact training set (identical mt19937_64 streams) and bias
    # the quantile-ABC posterior toward data the compared models trained on.
    #
    # Chunk i always draws from stream ABC_SEED_OFFSET + seed + i, so a pool
    # grown from 1e7 to 1e8 rows (same chunk size) extends the smaller pool
    # exactly: the first rows are bit-identical, results stay comparable.
    t0 = time.time()
    n_workers = n_workers or os.cpu_count()

    # At reference scale (rejection_sampling.py:76: N = int(1e8)) the pool is
    # 8-40 GB; build it row-streamed into uncompressed .npy memmaps written
    # in-place at chunk offsets, with chunk-granular resume via a sidecar
    # progress file — a multi-hour generation survives interruption.
    tfx, tfy = fx + ".building", fy + ".building"
    prog_path = fx + ".progress"
    done = set()
    x_probe, y_probe = _sample_chunk(
        (model_factory, 2, ABC_SEED_OFFSET + seed, engine, sub_batch)
    )
    if os.path.exists(tfx) and os.path.exists(tfy) and os.path.exists(prog_path):
        with open(prog_path) as f:
            hdr = f.readline().split()
        # The engine is part of the pool's provenance: a pool started under
        # engine='native' (MT19937, f64 geometry) must not silently complete
        # under engine='tpu' (threefry, f32) — that would mix generators in
        # one cache with no record. Old 3-field headers predate the engine
        # field and are likewise refused (fresh rebuild).
        if hdr[:3] == [str(n_total), str(chunk), str(seed)]:
            if len(hdr) > 3 and hdr[3] == engine:
                done = {int(l) for l in open(prog_path).read().split()[4:]}
            else:
                raise RuntimeError(
                    f"partial pool {tfx} was built with engine="
                    f"{hdr[3] if len(hdr) > 3 else '<unrecorded>'!r}, refusing "
                    f"to resume with engine={engine!r} — delete the .building/"
                    f".progress sidecars to rebuild from scratch"
                )
    if done:  # resume: reopen in place (header already on disk)
        xs = np.lib.format.open_memmap(tfx, mode="r+")
        ys = np.lib.format.open_memmap(tfy, mode="r+")
        assert xs.shape == (n_total, x_probe.shape[1]), xs.shape
    else:
        xs = np.lib.format.open_memmap(
            tfx, mode="w+", dtype=np.float32, shape=(n_total, x_probe.shape[1])
        )
        ys = np.lib.format.open_memmap(
            tfy, mode="w+", dtype=np.float32, shape=(n_total, y_probe.shape[1])
        )
    if not done:
        with open(prog_path, "w") as f:
            f.write(f"{n_total} {chunk} {seed} {engine}\n")
    todo = [i for i in range(n_chunks) if i not in done]
    if todo and engine == "tpu":
        # in-process serial loop: the device is the parallelism
        with open(prog_path, "a") as prog:
            for j, i in enumerate(todo):
                xc, yc = _sample_chunk(
                    (model_factory, chunk, ABC_SEED_OFFSET + seed + i, engine, sub_batch)
                )
                xs[i * chunk : (i + 1) * chunk] = xc[:chunk]
                ys[i * chunk : (i + 1) * chunk] = yc[:chunk]
                prog.write(f"{i}\n")
                if (j + 1) % max(1, len(todo) // 100) == 0:
                    prog.flush()
                    rate = (j + 1) * chunk / max(time.time() - t0, 1e-9)
                    print(
                        f"prepare_samples[{model.name}/tpu]: {j + 1}/{len(todo)} "
                        f"chunks ({rate:,.0f} rows/s, "
                        f"ETA {(len(todo) - j - 1) * chunk / rate / 60:.1f} min)",
                        flush=True,
                    )
        todo = []
    if todo:
        args = [
            (model_factory, chunk, ABC_SEED_OFFSET + seed + i, engine, sub_batch)
            for i in todo
        ]
        # fork, deliberately: spawn re-imports __main__ (hangs REPL/stdin
        # callers without a __main__ guard), and the workers touch only
        # numpy/scipy — no JAX/XLA state crosses the fork.
        mp = mp.get_context("fork")
        with mp.Pool(n_workers) as pool, open(prog_path, "a") as prog:
            for j, (xc, yc) in enumerate(pool.imap(_sample_chunk, args, chunksize=4)):
                i = todo[j]
                xs[i * chunk : (i + 1) * chunk] = xc[:chunk]
                ys[i * chunk : (i + 1) * chunk] = yc[:chunk]
                prog.write(f"{i}\n")
                if (j + 1) % max(1, len(todo) // 100) == 0:
                    prog.flush()
                    rate = (j + 1) * chunk / max(time.time() - t0, 1e-9)
                    print(f"prepare_samples[{model.name}]: {j + 1}/{len(todo)} chunks "
                          f"({rate:,.0f} rows/s, ETA {(len(todo) - j - 1) * chunk / rate / 60:.0f} min)",
                          flush=True)
    xs.flush(); ys.flush()
    del xs, ys
    os.replace(tfx, fx)
    os.replace(tfy, fy)
    os.remove(prog_path)
    print(f"prepared {n_total:,} prior samples in {time.time() - t0:.1f}s "
          f"({n_workers} workers)")
    return np.load(fx, mmap_mode="r"), np.load(fy, mmap_mode="r")


# -- quantile ABC --------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _chunk_topk_fn(k: int, mesh=None):
    """Module-level jitted distance+top-k so repeated quantile_ABC calls hit
    the jit cache instead of re-tracing per call (hot path: once per ABC
    target, up to 1000 targets per comparison sweep).

    With ``mesh``, the observation chunk is sharded over the mesh's data axis:
    each device computes distances + a local top-k on its shard and only the
    merged k survivors are exchanged (GSPMD's two-phase TopK partitioning) —
    the 1e8-row pool never needs to fit one device.
    """
    import jax
    import jax.numpy as jnp

    def chunk_topk(y_chunk, yt):
        d = jnp.sqrt(jnp.sum((y_chunk - yt) ** 2, axis=1))
        neg, idx = jax.lax.top_k(-d, min(k, y_chunk.shape[0]))
        return -neg, idx

    if mesh is None:
        return jax.jit(chunk_topk)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    return jax.jit(chunk_topk, in_shardings=(batch, repl), out_shardings=(repl, repl))


def _pad_pool_rows(yc, multiple: int):
    """Pad an observation chunk to a shardable row count with far-away rows.

    Pad magnitude 1e15: squared distances (~1e30) stay finite in float32, so
    pad rows sort strictly after every true row instead of relying on inf
    compares. Device (jax) chunks are padded with jnp ops so a
    device-resident pool never round-trips through the host."""
    pad = (-yc.shape[0]) % multiple
    if pad == 0:
        return yc
    import jax
    import jax.numpy as jnp

    xp = jnp if isinstance(yc, jax.Array) else np
    filler = xp.full((pad, yc.shape[1]), 1e15, yc.dtype)
    return xp.concatenate([yc, filler], axis=0)


def quantile_ABC(
    x: np.ndarray, y: np.ndarray, y_target: np.ndarray, n: int = 4000,
    device_chunk: int = 16_000_000, mesh=None,
) -> Tuple[np.ndarray, float]:
    """The ``n`` prior samples whose observations are closest to ``y_target``
    (excluding the single closest, matching the reference's ``[1:]`` slice —
    rejection_sampling.py:88-96). Returns (samples, threshold).

    Distance + top-k run chunked on the accelerator; only (n+2)-sized
    per-chunk survivors return to host. With ``mesh``, each chunk is sharded
    over the mesh's data axis (local top-k per device, merged survivors
    exchanged over ICI).

    ``y`` may be a device (jax) array: chunks then slice ON device with no
    host transfer. Callers looping many targets against one pool should
    upload it once (an 80 MB pool re-uploaded per target dominates the
    sweep through the tunnel) — compare_conditional does.
    """
    import jax
    import jax.numpy as jnp

    y_t = np.asarray(y_target, np.float32).reshape(1, -1)
    k = min(n + 2, y.shape[0])  # +1 for the dropped nearest, +1 for threshold
    chunk_topk = _chunk_topk_fn(k, mesh)
    n_dev = mesh.shape["data"] if mesh is not None else 1
    on_device = isinstance(y, jax.Array)

    best_d, best_i = [], []
    for start in range(0, y.shape[0], device_chunk):
        if on_device:
            yc = y[start : start + device_chunk]
        else:
            yc = np.asarray(y[start : start + device_chunk], np.float32)
        if mesh is not None:
            yc = _pad_pool_rows(yc, n_dev)
        d, i = chunk_topk(jnp.asarray(yc), jnp.asarray(y_t))
        best_d.append(np.asarray(d))
        best_i.append(np.asarray(i) + start)
    d = np.concatenate(best_d)
    i = np.concatenate(best_i)
    if mesh is not None:  # drop pad-row survivors (tiny pools only)
        valid = i < y.shape[0]
        d, i = d[valid], i[valid]
    order = np.argsort(d, kind="stable")[1 : k]  # drop single nearest (:93)
    sel = i[order][:n]
    threshold = float(d[order[n]]) if len(order) > n else float(d[order[-1]])
    return np.ascontiguousarray(x[sel]), threshold


# -- conditional ground-truth correlation (rejection_sampling.py:105-132) -------------


def correlation_conditional(
    data_model, y_target, n: int = 4000, out_dir: str = "data", abc_dir: str = "abc",
    tol: float = 0.05,
) -> np.ndarray:
    """GT posterior correlation matrix for one target; cached like the
    reference (data/{name}_corr_conditional{_sample}.npy)."""
    y_target = np.asarray(y_target, np.float32)
    os.makedirs(out_dir, exist_ok=True)
    f_sample = os.path.join(out_dir, f"{data_model.name}_corr_conditional_sample.npy")
    if os.path.exists(f_sample):
        sample = np.load(f_sample)
    elif data_model.name.startswith("lens-shape"):
        x = np.load(os.path.join(abc_dir, f"{data_model.name}_x_huge.npy"), mmap_mode="r")
        y = np.load(os.path.join(abc_dir, f"{data_model.name}_y_huge.npy"), mmap_mode="r")
        sample, _ = quantile_ABC(x, y, y_target, n=n)
    else:  # plus-shape: target-conditioned rejection (rejection_sampling.py:113-127)
        try:  # native rejection loop: ~0.06 ms/trial vs ~1 ms in Python
            from hint_tpu.data import native

            sample, _ = native.sample_plus_conditional(y_target, n, tol=tol)
            assert len(sample) == n
        except Exception:
            samples = []
            while len(samples) < n:
                coords, label = data_model.generate_plus_shape(forward=True, target=y_target)
                if np.sqrt(np.sum(np.square(y_target - label))) < tol:
                    samples.append(
                        data_model.fourier_coeffs(coords, n_coeffs=data_model.n_parameters // 4)
                    )
            sample = data_model.flatten_coeffs(np.stack(samples))
    np.save(f_sample, sample)
    corr = np.corrcoef(sample.T)
    np.save(os.path.join(out_dir, f"{data_model.name}_corr_conditional.npy"), corr)
    return corr


# -- systematic comparisons ------------------------------------------------------------


def _mmd_with_reject(sample: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """MMD computed on the finite rows only, with BOTH sides truncated to the
    surviving count (never resample survivors — that silently flatters a
    model whose tail diverges), plus the rejection rate to report alongside.

    The reference applies no filter (rejection_sampling.py:148-157): at its
    training budget inverse divergence is absent, and a non-finite sample
    would just NaN the metric. mmd is NaN here when <2 rows survive.
    """
    import jax.numpy as jnp

    from hint_tpu.evaluation.mmd import multi_mmd

    ok = np.isfinite(sample).all(axis=1) & (np.abs(sample).max(axis=1) < 1e6)
    k = int(ok.sum())
    rej = 1.0 - k / sample.shape[0]
    if k < 2:
        return float("nan"), rej
    return float(multi_mmd(jnp.asarray(sample[ok][:k]), jnp.asarray(gt[:k]))), rej


def compare_unconditional(
    data_model,
    samplers: Dict[str, Callable[[np.ndarray], np.ndarray]],
    n_runs: int = 100,
    sample_size: int = 4000,
    abc_dir: str = "abc",
    run: int = 0,
    seed: int = 0,
    verbose: bool = True,
) -> Dict[str, Dict[str, list]]:
    """MMD of each model's prior samples vs held-out true prior samples
    (rejection_sampling.py:135-165). ``samplers[name](z) -> x`` inverts the
    shared latent batch. Draws are derived per run index from ``seed`` so an
    interrupted sweep resumes with identical latents."""
    x = np.load(os.path.join(abc_dir, f"{data_model.name}_x_huge.npy"), mmap_mode="r")
    out = {name: {"times": [], "mmds": [], "rejects": []} for name in samplers}
    for i in range(n_runs):
        rng = np.random.default_rng((seed, i))
        sel = rng.choice(x.shape[0], sample_size, replace=False)
        gt = np.ascontiguousarray(x[np.sort(sel)])
        z = rng.standard_normal((sample_size, data_model.n_parameters)).astype(np.float32)
        for name, sampler in samplers.items():
            t0 = time.time()
            sample = np.asarray(sampler(z))
            out[name]["times"].append(time.time() - t0)
            mmd, rej = _mmd_with_reject(sample, gt)
            out[name]["mmds"].append(mmd)
            out[name]["rejects"].append(rej)
            if verbose:
                print(f"run {i + 1}/{n_runs} {name}: mmd={out[name]['mmds'][-1]:.5f} "
                      f"rej={rej:.3f} ({out[name]['times'][-1]:.3f}s)")
    _dump_comparison(out, os.path.join(abc_dir, f"{data_model.name}_unconditional_comparison_{run}.pkl"))
    return out


def compare_conditional(
    data_model,
    samplers: Dict[str, Callable[[np.ndarray, np.ndarray], np.ndarray]],
    n_runs: int = 1000,
    sample_size: int = 4000,
    abc_dir: str = "abc",
    run: int = 0,
    seed: int = 0,
    verbose: bool = True,
    checkpoint_every: int = 50,
) -> Dict[str, Dict[str, list]]:
    """Per-target posterior MMD vs quantile-ABC ground truth + forward-process
    distance (rejection_sampling.py:168-213). ``samplers[name](y_tiled, z) ->
    x``. GT posteriors cache to abc/{name}/{i:05}.pkl, reference layout.

    Multi-hour at reference scale (1000 targets x all models), so progress
    checkpoints to ``<output>.partial`` every ``checkpoint_every`` targets and
    resumes from it; the shared latents are derived per target index from
    ``seed``, so a resumed sweep is identical to an uninterrupted one.
    """
    import jax.numpy as jnp

    from hint_tpu.evaluation.metrics import mean_target_distance

    x = np.load(os.path.join(abc_dir, f"{data_model.name}_x_huge.npy"), mmap_mode="r")
    y = np.load(os.path.join(abc_dir, f"{data_model.name}_y_huge.npy"), mmap_mode="r")
    # observation pool device-resident across all targets (tiny vs HBM;
    # re-uploading ~80 MB per quantile-ABC call dominated the sweep)
    y = jnp.asarray(np.asarray(y, np.float32))
    gt_dir = os.path.join(abc_dir, data_model.name)
    os.makedirs(gt_dir, exist_ok=True)
    final_path = os.path.join(abc_dir, f"{data_model.name}_conditional_comparison_{run}.pkl")
    part_path = final_path + ".partial"
    out = {name: {"times": [], "mmds": [], "dists": [], "rejects": []} for name in samplers}
    start = 0
    if os.path.exists(part_path):
        try:
            with open(part_path, "rb") as f:
                saved = pickle.load(f)
            if set(saved) == set(out):
                out = saved
                start = len(next(iter(out.values()))["mmds"])
        except Exception:
            pass
    for i in range(start, n_runs):
        f_gt = os.path.join(gt_dir, f"{i:05}.pkl")
        try:
            with open(f_gt, "rb") as f:
                y_target, gt_sample, threshold = pickle.load(f)
            assert gt_sample.shape[0] >= sample_size
        except Exception:
            # draw the observation via the joint sampler, not forward_process:
            # the plus-shape forward map is only defined at generation time
            # (labels from generate_plus_shape(forward=True), data.py:224-225;
            # its forward_process is a center-only estimate of the wrong dim)
            _, y_label = data_model.sample_joint(1)
            y_target = np.asarray(y_label, np.float32)
            gt_sample, threshold = quantile_ABC(x, y, y_target[0], n=sample_size)
            with open(f_gt, "wb") as f:
                pickle.dump((y_target, gt_sample, threshold), f)
        z = np.random.default_rng((seed, i)).standard_normal(
            (sample_size, data_model.n_parameters)
        ).astype(np.float32)
        y_tiled = np.broadcast_to(
            np.asarray(y_target, np.float32).reshape(1, -1), (sample_size, data_model.n_observations)
        )
        for name, sampler in samplers.items():
            t0 = time.time()
            sample = np.asarray(sampler(y_tiled, z))
            out[name]["times"].append(time.time() - t0)
            mmd, rej = _mmd_with_reject(sample, gt_sample)
            out[name]["mmds"].append(mmd)
            out[name]["rejects"].append(rej)
            ok = np.isfinite(sample).all(axis=1)
            # forward-process distance only where the model defines a true
            # forward map (lens; the plus forward map exists only at
            # generation time — has_forward_process=False)
            out[name]["dists"].append(
                mean_target_distance(
                    data_model, np.asarray(y_target).reshape(-1), sample[ok]
                )
                if ok.any() and getattr(data_model, "has_forward_process", True)
                else float("nan")
            )
            if verbose:
                print(f"run {i + 1}/{n_runs} {name}: mmd={out[name]['mmds'][-1]:.5f} "
                      f"dist={out[name]['dists'][-1]:.5f} rej={rej:.3f} "
                      f"({out[name]['times'][-1]:.3f}s)")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            _dump_comparison(out, part_path)
            print(f"compare_conditional: {i + 1}/{n_runs} targets", flush=True)
    _dump_comparison(out, final_path)
    if os.path.exists(part_path):
        os.remove(part_path)
    return out


def _dump_comparison(out: Dict, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(out, f)


def accumulate_metrics(
    data_model_name: str, conditional: bool, model_names, abc_dir: str = "abc", n_runs: int = 3
) -> Dict[str, Tuple[float, float]]:
    """mean ± std of per-run mean MMDs over the training runs
    (rejection_sampling.py:216-243)."""
    kind = "conditional" if conditional else "unconditional"
    mmds = {name: [] for name in model_names}
    for i in range(n_runs):
        path = os.path.join(abc_dir, f"{data_model_name}_{kind}_comparison_{i}.pkl")
        with open(path, "rb") as f:
            d = pickle.load(f)
        for name in model_names:
            if name in d:
                mmds[name].append(np.mean(d[name]["mmds"]))
    result = {}
    for name, vals in mmds.items():
        result[name] = (float(np.nanmean(vals)), float(np.nanstd(vals)))
        print(f"{name}: {result[name][0]:.3f} \\pm {result[name][1]:.3f}")
    return result


def check_mmd_kernels(x, y, widths_exponents=((1, 0.5), (0.2, 0.8), (0.2, 0.4)), out_path="mmd_kernels.png"):
    """Distance histograms overlaid with the MMD kernels, saved headless
    (rejection_sampling.py:33-53)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d_xx = np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1).ravel()
    d_yy = np.sum((y[:, None, :] - y[None, :, :]) ** 2, axis=-1).ravel()
    d_xy = np.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1).ravel()
    bins = np.linspace(0, 20, 100)
    plt.figure()
    for d, label in ((d_xx, "dxx"), (d_yy, "dyy"), (d_xy, "dxy")):
        plt.hist(d, bins, alpha=0.5, label=label, density=True)
    total = np.zeros_like(bins)
    for c, a in widths_exponents:
        k = c**a * ((c + bins) / a) ** -a
        total += k
        plt.plot(bins, k, label=f"{c:.2f}/{a:.2f}")
    plt.plot(bins, total, lw=2, c="k", label="sum")
    plt.legend(loc="upper right")
    plt.savefig(out_path, dpi=120)
    plt.close()
    return out_path
