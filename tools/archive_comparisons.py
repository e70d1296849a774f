#!/usr/bin/env python
"""Archive fresh comparison pickles from gitignored abc/ into the committed
record (artifacts/campaign/comparisons/), recording the pool each sweep was
scored against in PROVENANCE.json so the report can label its tables.

Usage: python tools/archive_comparisons.py [round_tag]

Idempotent; only copies pickles that exist in abc/. Sidecar entries for
pickles that are not re-archived are left untouched.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys

ABC = "abc"
ARCHIVE = os.path.join("artifacts", "campaign", "comparisons")
PROV = os.path.join(ARCHIVE, "PROVENANCE.json")

tag = sys.argv[1] if len(sys.argv) > 1 else "r5"
os.makedirs(ARCHIVE, exist_ok=True)
provenance = {}
if os.path.exists(PROV):
    with open(PROV) as f:
        provenance = json.load(f)

copied = 0
for path in sorted(glob.glob(os.path.join(ABC, "*_comparison_*.pkl"))):
    fname = os.path.basename(path)
    dm_name = fname.split("_unconditional_")[0].split("_conditional_")[0]
    fx = os.path.join(ABC, f"{dm_name}_x_huge.npy")
    n_pool = None
    if os.path.exists(fx):
        import numpy as np

        n_pool = int(np.load(fx, mmap_mode="r").shape[0])
    shutil.copy2(path, os.path.join(ARCHIVE, fname))
    provenance[fname] = (
        f"{tag} sweep vs a {n_pool:,}-row prior pool" if n_pool
        else f"{tag} sweep (pool size unrecorded)"
    )
    copied += 1
    print(f"archived {fname} <- {provenance[fname]}")

with open(PROV, "w") as f:
    json.dump(provenance, f, indent=1, sort_keys=True)
print(f"{copied} pickles archived; provenance -> {PROV}")
