#!/usr/bin/env python
"""Build (or resume) a toy-family ABC pool with the TPU engine.

Usage: python tools/pool_tpu.py [family] [n_total] [sub_batch]

``family`` is ``lens`` (default) or ``plus``. Chunk-resumable
(abc.prepare_samples sidecar progress); safe to run under ``timeout`` —
re-invoking continues where the cut left off. Prints the sustained rows/s
so the pool-rebuild cost is on the record even when the run is
time-bounded.

The chunk size is an exact multiple of ``sub_batch`` so no generated rows
are discarded (a 100k chunk over 32768-row device batches would throw away
24% of the device work).
"""
import sys

sys.path.insert(0, ".")

from hint_tpu.data.fourier import LensShapeModel, PlusShapeModel
from hint_tpu.evaluation.abc import prepare_samples

args = [a for a in sys.argv[1:]]
family = args.pop(0) if args and args[0] in ("lens", "plus") else "lens"
n = int(float(args[0])) if len(args) > 0 else int(1e8)
sub_batch = int(args[1]) if len(args) > 1 else 32768

factory = LensShapeModel if family == "lens" else PlusShapeModel
# 32·sub_batch = 4 pipelined 8-sub-batch dispatches per resume-granular
# chunk (sample_joint group=8): the progress sidecar advances every ~1M
# rows while transfers still overlap compute within each chunk.
x, y = prepare_samples(factory, n_total=n, out_dir="abc",
                       chunk=32 * sub_batch, engine="tpu", sub_batch=sub_batch)
print(f"pool ready: {x.shape} {y.shape}")
