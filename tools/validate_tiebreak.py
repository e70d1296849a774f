#!/usr/bin/env python
"""Empirical validation of the lens TPU engine's tie-break handling.

Usage: python tools/validate_tiebreak.py [n_rows] [sub_batch] [--gen-only | --recheck]

``--gen-only`` runs just the device sweep + production host fixes and
saves them to artifacts/tiebreak_rows.npz (seconds of TPU time);
``--recheck`` loads that file and runs the f64 full recheck on the host
(CPU-bound, ~20 min at 1e5 rows) — so the recheck can overlap the next
TPU stage instead of idling the chip. No flag = both phases in-process.

VERDICT r4 #5: the ambiguity band (_forward_screen's BAND_EPS) and the
seam-twin path were argued from error analysis; this tool measures them.
It draws ``n_rows`` through the production kernel, applies the production
host fixes (band -> full f64 refine, seam -> twin-orientation f64 check),
then f64-rechecks EVERY row — not just flagged ones — against the host
full-matrix argmax (`_refine_host`, the reference's squareform(pdist)
semantics, /root/reference/data.py:127-139). Writes
artifacts/lens_tiebreak_validation.json with:

* ``disagree_rows``/``disagree_frac`` — rows whose production feats differ
  from the f64 full recheck beyond f32 representation error (2e-4). The
  engine's correctness claim is this number being 0.
* ``min_unflagged_margin`` — the smallest f64 top-two d² gap seen on any
  UNflagged row, vs the screen's band threshold: the measured safety
  factor that replaces round 4's reasoned-not-measured 10x narrowing.

Run on the TPU for the real engine (the screen's f32 rounding is
device-specific); CPU JAX gives a same-algorithm proxy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hint_tpu.utils import respect_env_platforms

respect_env_platforms()

import jax

from hint_tpu.data import lens_tpu

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
MODE = next((a for a in sys.argv[1:] if a.startswith("--")), None)
N_ROWS = int(float(ARGS[0])) if len(ARGS) > 0 else 100_000
SUB = int(ARGS[1]) if len(ARGS) > 1 else 16_384
ATOL = 2e-4  # f32 representation error on the feats themselves
ROWS_NPZ = "artifacts/tiebreak_rows.npz"


def generate():
    t0 = time.time()
    n_disp = -(-N_ROWS // SUB)
    base = jax.random.PRNGKey(7_501)
    feats_all, flags_all, x_all = [], [], []
    for i in range(n_disp):
        packed, _, _, _ = lens_tpu._chunk_kernel(jax.random.fold_in(base, i), SUB, 1)
        packed = np.asarray(packed)
        x = packed[:, :20]
        feats = packed[:, 20:22].astype(np.float64)
        flag = packed[:, 24].astype(np.int32)
        i1 = packed[:, 25].astype(np.int32)
        band = (flag & 1) != 0
        seam = (flag & 2) != 0
        assert not ((flag & 4) != 0).any(), "bad ring in validation draw"
        # production fixes
        if band.any():
            feats[band] = lens_tpu._refine_host(x[band])
        seam_only = seam & ~band
        if seam_only.any():
            feats[seam_only] = lens_tpu._seam_host(x[seam_only], i1[seam_only])
        feats_all.append(feats)
        flags_all.append(flag)
        x_all.append(x)
    x = np.concatenate(x_all)[:N_ROWS]
    feats = np.concatenate(feats_all)[:N_ROWS]
    flag = np.concatenate(flags_all)[:N_ROWS]
    t_gen = time.time() - t0
    platform = jax.devices()[0].platform
    return x, feats, flag, t_gen, platform


def main():
    if MODE == "--recheck":
        blob = np.load(ROWS_NPZ)
        x, feats, flag = blob["x"], blob["feats"], blob["flag"]
        t_gen, platform = float(blob["t_gen"]), str(blob["platform"])
    else:
        x, feats, flag, t_gen, platform = generate()
        if MODE == "--gen-only":
            os.makedirs("artifacts", exist_ok=True)
            np.savez(ROWS_NPZ, x=x, feats=feats, flag=flag, t_gen=t_gen,
                     platform=platform)
            print(f"saved {len(x)} rows to {ROWS_NPZ} ({t_gen:.1f}s on "
                  f"{platform}); run --recheck for the f64 audit")
            return

    # f64 full recheck of every row, plus the top-two margin distribution
    t_recheck0 = time.time()
    from hint_tpu.data.fourier import LensShapeModel

    model = LensShapeModel()
    disagree = 0
    worst = 0.0
    min_margin_unflagged = np.inf
    CH = 2000
    for s in range(0, len(x), CH):
        xs = x[s : s + CH]
        pts = model.trace_fourier_curves(model.unflatten_coeffs(xs))
        q = pts.astype(np.float64)
        d2 = (q[:, :, None, 0] - q[:, None, :, 0]) ** 2 + (
            q[:, :, None, 1] - q[:, None, :, 1]
        ) ** 2
        flat = d2.reshape(len(q), -1)
        rows = np.arange(len(q))
        # first-max = the reference's row-major argmax over the full
        # (symmetric) matrix — NOT argsort[-1], which is last-of-ties and
        # would land on the mirrored (i1, i0) entry. The argmax MUST run on
        # sqrt'd distances, not d²: the reference argmaxes
        # squareform(pdist(...)) (/root/reference/data.py:133), and at the
        # seam the twin pairs (0,i)/(i,99) differ by 1-2 ulp in d² — sqrt
        # rounds them EQUAL, so first-max lands on row 0's (0,i), while a
        # d² argmax lands on (i,99). Both production host paths sqrt for
        # exactly this reason; an earlier d²-based recheck here reported
        # 4/100000 false "disagreements" that scipy pdist itself resolves
        # the engine's way (bit-exact, error 0.0e+00 on all four).
        flat_idx = np.sqrt(flat).argmax(axis=1)
        top = flat[rows, flat_idx]
        i0, i1 = np.unravel_index(flat_idx, (lens_tpu.N_TRACE, lens_tpu.N_TRACE))
        # second-best DISTINCT pair: mask both mirror entries of the winner
        masked = flat.copy()
        masked[rows, i0 * lens_tpu.N_TRACE + i1] = -np.inf
        masked[rows, i1 * lens_tpu.N_TRACE + i0] = -np.inf
        second = masked.max(axis=1)
        ref = (q[rows, i1] - q[rows, i0])[:, ::-1]
        err = np.abs(feats[s : s + CH] - ref).max(axis=1)
        bad = err > ATOL
        disagree += int(bad.sum())
        worst = max(worst, float(err.max()))
        unflagged = flag[s : s + CH] == 0
        # margin between the winning pair and the best distinct pair; for
        # seam rows this includes the ~0-gap twin, but those are flagged
        # and excluded here
        margin = top - second
        m = margin[unflagged]
        if m.size:
            min_margin_unflagged = min(min_margin_unflagged, float(m.min()))
        if s // CH % 10 == 0:
            print(f"{s + len(xs)}/{len(x)} rechecked", flush=True)

    band_frac = float(((flag & 1) != 0).mean())
    seam_frac = float(((flag & 2) != 0).mean())
    out = {
        "n_rows": int(len(x)),
        "platform": platform,
        "band_frac": band_frac,
        "seam_frac": seam_frac,
        "disagree_rows": disagree,
        "disagree_frac": disagree / len(x),
        "worst_abs_feat_err": worst,
        "min_unflagged_top2_gap_d2": (
            None if not np.isfinite(min_margin_unflagged) else min_margin_unflagged
        ),
        "gen_seconds": t_gen,
        "recheck_seconds": time.time() - t_recheck0,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/lens_tiebreak_validation.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
