#!/usr/bin/env python
"""Build a family's conditional quantile-ABC ground-truth cache against the
1e8 pool with FRESH y-targets.

Usage: python tools/precompute_gt_fresh.py [lens|plus] [n_targets]

Why this exists: the host reboot wiped ``abc/`` (gitignored bulk data) —
the 1e8 pools were rebuilt by ``campaign pool``, but the per-target GT
posterior cache ``abc/<name>/{i:05}.pkl`` and the archived 1e7-pool targets
that tools/precompute_gt.py reuses are gone. Fresh targets drawn from the
same joint sampler are statistically equivalent (the reference also draws
its observations via the generative model, rejection_sampling.py:83-88);
the 1e7-vs-1e8 threshold scaling study that needed *matched* targets was
already completed and committed (artifacts/*_gt_1e8_thresholds.json).

The cache layout and tuple format match what
``hint_tpu.evaluation.abc.compare_conditional`` reads back
(``(y_target[1,d_y], gt_sample[n,d_x], threshold)``), so the comparison
sweeps hit the cache for all three training runs instead of rebuilding GT
on the TPU's critical path. Resumable per target; CPU-safe (run under
JAX_PLATFORMS=cpu while the TPU is busy).
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hint_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np

ABC = "abc"
FAMILY = (sys.argv[1] if len(sys.argv) > 1 else "lens").lower()
N_TARGETS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
NAME = {"lens": "lens-shape1", "plus": "plus-shape"}[FAMILY]
D_Y = {"lens": 2, "plus": 4}[FAMILY]
GT_DIR = os.path.join(ABC, NAME)
N = 4000  # sample_size of the comparison protocol (rejection_sampling.py:88)


def main():
    x = np.load(f"{ABC}/{NAME}_x_huge.npy", mmap_mode="r")
    y = np.load(f"{ABC}/{NAME}_y_huge.npy", mmap_mode="r")
    assert x.shape[0] >= int(1e8), f"pool has {x.shape[0]} rows; build it first"

    import jax

    from hint_tpu.evaluation.abc import quantile_ABC
    from hint_tpu.experiments.campaign import _data_model

    dm = _data_model(FAMILY)
    # Deterministic target stream: targets are drawn through the models'
    # global-numpy generative path (data.py parity), so pin the global seed.
    np.random.seed(97_000 + D_Y)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        import jax.numpy as jnp

        y_dev = jnp.asarray(np.asarray(y, np.float32))  # one upload, reused
    else:
        y_dev = y

    os.makedirs(GT_DIR, exist_ok=True)
    thresholds = []
    t0 = time.time()
    for i in range(N_TARGETS):
        out = os.path.join(GT_DIR, f"{i:05}.pkl")
        # always advance the target RNG so a resumed run sees the same
        # target at index i as an uninterrupted one
        _, y_label = dm.sample_joint(1)
        if os.path.exists(out):
            with open(out, "rb") as f:
                _, _, thr = pickle.load(f)
        else:
            y_target = np.asarray(y_label, np.float32)
            gt_sample, thr = quantile_ABC(x, y_dev, y_target[0], n=N)
            tmp = out + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump((y_target, gt_sample, float(thr)), f)
            os.replace(tmp, out)
        thresholds.append(float(thr))
        if (i + 1) % 20 == 0:
            dt = time.time() - t0
            print(f"{i + 1}/{N_TARGETS} targets ({dt / (i + 1):.2f} s/target, "
                  f"ETA {(N_TARGETS - i - 1) * dt / (i + 1) / 60:.0f} min)",
                  flush=True)

    thr = np.array(thresholds)
    stats = {
        "family": FAMILY, "pool_rows": int(x.shape[0]), "n_targets": N_TARGETS,
        "threshold_mean": float(thr.mean()), "threshold_std": float(thr.std()),
        "note": "fresh targets (post-reboot rebuild); matched-target scaling "
                "study lives in artifacts/%s_gt_1e8_thresholds.json" % FAMILY,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open(f"artifacts/{FAMILY}_gt_1e8_fresh_thresholds.json", "w") as f:
        json.dump(stats, f)
    print(f"done: threshold mean {thr.mean():.4f} ± {thr.std():.4f} "
          f"({N_TARGETS} targets vs {x.shape[0]:,} rows)")


if __name__ == "__main__":
    main()
