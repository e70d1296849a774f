#!/usr/bin/env python
"""Build (or resume) the lens ABC pool with the TPU engine.

Usage: python tools/pool_tpu.py [n_total] [sub_batch]

Chunk-resumable (abc.prepare_samples sidecar progress); safe to run under
``timeout`` — re-invoking continues where the cut left off. Prints the
sustained rows/s so the pool-rebuild cost is on the record even when the
run is time-bounded.
"""
import sys

sys.path.insert(0, ".")

from hint_tpu.data.fourier import LensShapeModel
from hint_tpu.evaluation.abc import prepare_samples

n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e8)
x, y = prepare_samples(LensShapeModel, n_total=n, out_dir="abc",
                       chunk=100_000, engine="tpu")
print(f"pool ready: {x.shape} {y.shape}")
