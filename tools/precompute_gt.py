#!/usr/bin/env python
"""Recompute a family's conditional ABC ground truth against the 1e8 pool,
REUSING the 1e7 run's y-targets (VERDICT r3 #3).

Usage: python tools/precompute_gt.py [lens|plus]

Keeping the targets fixed makes the pool-size effect directly attributable:
the same 1000 observations, a 10x larger prior pool, so the quantile-ABC
threshold (distance to the (n+1)-th neighbour) must drop ~10^(1/d_y)x
(d_y=2 lens -> sqrt(10); d_y=4 plus -> 1.78) and the GT posterior sharpens
correspondingly.

Steps:
1. archive abc/lens-shape1/ (old per-target GT) + old comparison pickles +
   the pool-derived correlation caches into abc/pool1e7_archive/ (same moves
   as tools/rerun_lens_conditional_1e8.sh, done here so the y-targets can be
   read back from the archive);
2. for each archived target: quantile_ABC against the new pool, write the
   fresh abc/<name>/{i:05}.pkl the comparison sweep will consume;
3. record old-vs-new thresholds in artifacts/<fam>_gt_1e8_thresholds.json.

Resumable per target. Works on CPU (slow, ~2-5 s/target) or TPU.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np

ABC = "abc"
ARCH = os.path.join(ABC, "pool1e7_archive")
FAMILY = (sys.argv[1] if len(sys.argv) > 1 else "lens").lower()
NAME = {"lens": "lens-shape1", "plus": "plus-shape"}[FAMILY]
D_Y = {"lens": 2, "plus": 4}[FAMILY]
GT_DIR = os.path.join(ABC, NAME)
N = 4000  # sample_size of the comparison protocol (rejection_sampling.py:88)


def archive_once():
    old_dir = os.path.join(ARCH, NAME)
    if os.path.exists(old_dir):
        return old_dir  # already archived (resume)
    os.makedirs(ARCH, exist_ok=True)
    assert os.path.isdir(GT_DIR), "no existing GT dir to archive"
    shutil.move(GT_DIR, old_dir)
    for pat in (
        [f"{ABC}/{NAME}_conditional_comparison_{r}.pkl" for r in range(3)]
        + [f"{ABC}/{NAME}_conditional_comparison_{r}.pkl.partial" for r in range(3)]
        + [f"data/{NAME}_corr_conditional_sample.npy",
           f"data/{NAME}_corr_conditional.npy"]
    ):
        if os.path.exists(pat):
            shutil.move(pat, os.path.join(ARCH, os.path.basename(pat)))
            print(f"archived {pat}")
    return old_dir


def main():
    x = np.load(f"{ABC}/{NAME}_x_huge.npy", mmap_mode="r")
    y = np.load(f"{ABC}/{NAME}_y_huge.npy", mmap_mode="r")
    assert x.shape[0] >= int(1e8), f"pool has {x.shape[0]} rows; build it first"

    from hint_tpu.evaluation.abc import quantile_ABC

    old_dir = archive_once()
    os.makedirs(GT_DIR, exist_ok=True)
    targets = sorted(f for f in os.listdir(old_dir) if f.endswith(".pkl"))
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        import jax.numpy as jnp

        y_dev = jnp.asarray(np.asarray(y, np.float32))  # 0.8 GB, one upload
    else:
        y_dev = y

    stats = {"old_threshold": [], "new_threshold": [], "pool_rows": int(x.shape[0])}
    t0 = time.time()
    for j, fname in enumerate(targets):
        out = os.path.join(GT_DIR, fname)
        with open(os.path.join(old_dir, fname), "rb") as f:
            y_target, _old_sample, old_thr = pickle.load(f)
        if os.path.exists(out):
            with open(out, "rb") as f:
                _, _, new_thr = pickle.load(f)
        else:
            gt_sample, new_thr = quantile_ABC(x, y_dev, np.asarray(y_target).reshape(-1), n=N)
            with open(out, "wb") as f:
                pickle.dump((y_target, gt_sample, new_thr), f)
        stats["old_threshold"].append(float(old_thr))
        stats["new_threshold"].append(float(new_thr))
        if (j + 1) % 20 == 0:
            dt = time.time() - t0
            print(f"{j + 1}/{len(targets)} targets ({dt / (j + 1):.2f} s/target, "
                  f"ETA {(len(targets) - j - 1) * dt / (j + 1) / 60:.0f} min)", flush=True)

    o, n_ = np.array(stats["old_threshold"]), np.array(stats["new_threshold"])
    stats["summary"] = {
        "old_mean": float(o.mean()), "new_mean": float(n_.mean()),
        "ratio_mean": float((o / n_).mean()),
        "expected_ratio": float(10 ** (1 / D_Y)),
    }
    os.makedirs("artifacts", exist_ok=True)
    with open(f"artifacts/{FAMILY}_gt_1e8_thresholds.json", "w") as f:
        json.dump(stats, f)
    print(f"threshold mean: {o.mean():.4f} -> {n_.mean():.4f} "
          f"(ratio {float((o / n_).mean()):.2f}, expected ~{10 ** (1 / D_Y):.2f} "
          f"for {D_Y}-dim y)")


if __name__ == "__main__":
    main()
