#!/usr/bin/env python
"""Honest sustained-rate measurement of the TPU pool engine.

Usage: python tools/time_pool_engine.py [family] [n] [sub_batch]

Measures three rates separately so the bottleneck is on the record:
  * device-only: the jitted chunk kernel, block_until_ready, no host work;
  * end-to-end: ``sample_joint`` (device kernel + host transfer + f64
    refine of ambiguous rows), the rate the pool build actually sustains;
  * refine fraction: how many rows the f64 host tie-break touches.

Writes artifacts/pool_rate_{family}.json. VERDICT r4 requires this
measurement before any "minutes on-chip" claim (RESULTS.md is only allowed
to state what this artifact shows).
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

family = sys.argv[1] if len(sys.argv) > 1 else "lens"
n = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1 << 21
sub_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32768

if family == "lens":
    from hint_tpu.data import lens_tpu as eng
else:
    from hint_tpu.data import plus_tpu as eng

import jax

key = jax.random.PRNGKey(123)

# --- device-only rate. block_until_ready does NOT reliably block on the
# tunneled axon platform, so sync through the packed chunk's host transfer
# (the same single transfer the pool build pays per chunk).
packed, *_extras = eng._chunk_kernel(key, sub_batch)
_ = np.asarray(packed)
t0 = time.time()
steps = max(1, n // sub_batch)
for i in range(steps):
    packed, *_extras = eng._chunk_kernel(jax.random.fold_in(key, i), sub_batch)
    host = np.asarray(packed)  # includes the packed D2H transfer in the rate
dev_s = time.time() - t0
dev_rate = steps * sub_batch / dev_s

flag = host[:, eng.N_PACK - 2].astype(np.int32)
flag_fracs = {
    "band": float(((flag & 1) != 0).mean()),
    "seam": float(((flag & 2) != 0).mean()),
    "bad": float(((flag & 4) != 0).mean()),
}

# --- end-to-end rate (fresh seed so nothing is cached) ---
t0 = time.time()
x, y = eng.sample_joint(n, seed=777, sub_batch=sub_batch)
e2e_s = time.time() - t0
e2e_rate = n / e2e_s

rec = {
    "family": family,
    "n": n,
    "sub_batch": sub_batch,
    "device_plus_transfer_rows_per_s": round(dev_rate),
    "end_to_end_rows_per_s": round(e2e_rate),
    "flag_fractions": flag_fracs,
    "pool_1e8_eta_min": round(1e8 / e2e_rate / 60, 1),
    "device_seconds": round(dev_s, 2),
    "end_to_end_seconds": round(e2e_s, 2),
}
path = f"artifacts/pool_rate_{family}.json"
with open(path, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))
print(f"wrote {path}")
