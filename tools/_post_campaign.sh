#!/bin/bash
# Remaining campaign stages + perf profile (resumable, one TPU process).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1

python -m hint_tpu.experiments.campaign shapes --family lens --n 1000
python -m hint_tpu.experiments.campaign shapes --family plus --n 1000
python -m hint_tpu.experiments.campaign compare --family plus --kind conditional --run 0

# bf16 flagship prior-MMD quality (VERDICT #6: NLL and MMD within f32 noise)
python - <<'EOF'
import os
from hint_tpu.experiments.campaign import make_samplers
from hint_tpu.evaluation.abc import compare_unconditional
from hint_tpu.data.fourier import PlusShapeModel

for seed in (0, 1, 2):
    for dtype, run in (("bfloat16", 100 + seed), ("float32", 200 + seed)):
        out = f"abc/plus-shape_unconditional_comparison_{run}.pkl"
        if os.path.exists(out):
            continue
        s = make_samplers(["plus_shape.unconditional_hint_4_full"], seed, dtype)
        compare_unconditional(
            PlusShapeModel(), s, n_runs=100, sample_size=4000, run=run,
            seed=run, verbose=False,
        )
        print(f"bf16-quality compare dtype={dtype} seed={seed}: done", flush=True)
EOF

python -m hint_tpu.experiments.campaign report
timeout 2400 python _profile_flagship.py steps
echo POST_CAMPAIGN_DONE
