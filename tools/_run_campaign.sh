#!/bin/bash
# Reference-scale evaluation campaign driver (VERDICT round-1 next #3, #6).
# Stages are idempotent; re-run to resume. One TPU process at a time.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1

# 1. training: 3 seeds x reference budgets
python -m hint_tpu.experiments.campaign train --family lens
python -m hint_tpu.experiments.campaign train --family plus
# bf16 flagship (quality-vs-f32 check, VERDICT #6)
python -m hint_tpu.experiments.campaign train --family plus \
    --configs plus_shape.unconditional_hint_4_full --dtype bfloat16

# 2. ABC prior pools (CPU-bound native generator; 1e7 per family)
python -m hint_tpu.experiments.campaign pool --family lens --n 10000000
python -m hint_tpu.experiments.campaign pool --family plus --n 10000000

# 3. comparisons: 3 training runs x {unconditional 100, conditional 1000}
for run in 0 1 2; do
  python -m hint_tpu.experiments.campaign compare --family lens --kind unconditional --run $run
  python -m hint_tpu.experiments.campaign compare --family plus --kind unconditional --run $run
done
for run in 0 1 2; do
  python -m hint_tpu.experiments.campaign compare --family lens --kind conditional --run $run
  python -m hint_tpu.experiments.campaign compare --family plus --kind conditional --run $run
done

# 4. shape scoring at n=1000
python -m hint_tpu.experiments.campaign shapes --family lens --n 1000
python -m hint_tpu.experiments.campaign shapes --family plus --n 1000

# 5. report
python -m hint_tpu.experiments.campaign report
echo CAMPAIGN_DONE
