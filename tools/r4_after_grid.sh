#!/usr/bin/env bash
# Round-4 TPU work that must run AFTER the ablation-grid resume exits:
#   1. per-family perf table (VERDICT r3 #5; crashed earlier on the
#      cpu-backend probe, now fixed)
#   2. lens conditional comparison sweep vs the rebuilt 1e8 ground-truth
#      pool (VERDICT r3 #3) — samplers self-heal their checkpoints
#   3. plus conditional comparison sweep vs its 1e8 pool IF that pool has
#      been rebuilt by then (optional: the build is ~2h of host CPU)
#   4. report + figures regeneration
# Never two TPU processes at once: this script polls for the grid pid to
# exit before touching the chip.
set -u
cd "$(dirname "$0")/.."
GRID_PID=${1:?usage: r4_after_grid.sh <grid_pid>}
LOG=artifacts/r4_after_grid.log
echo "[after_grid] $(date -u +%H:%M:%S) waiting for grid pid $GRID_PID" >> "$LOG"
while kill -0 "$GRID_PID" 2>/dev/null; do sleep 60; done
echo "[after_grid] $(date -u +%H:%M:%S) grid done" >> "$LOG"

timeout 5400 python -u tools/perf_families.py >> artifacts/perf_families_log.txt 2>&1
echo "[after_grid] $(date -u +%H:%M:%S) perf_families rc=$?" >> "$LOG"

# lens pool must be finalized (no .building suffix) before the sweeps
while [ ! -f abc/lens-shape1_x_huge.npy ]; do
    echo "[after_grid] $(date -u +%H:%M:%S) lens pool still building" >> "$LOG"
    sleep 120
done
for run in 0 1 2; do
    timeout 10800 python -u -m hint_tpu.experiments.campaign compare \
        --family lens --kind conditional --run "$run" >> artifacts/compare_lens_r4.log 2>&1
    echo "[after_grid] $(date -u +%H:%M:%S) lens compare run $run rc=$?" >> "$LOG"
done

if [ -f abc/plus-shape_x_huge.npy ]; then
    for run in 0 1 2; do
        timeout 10800 python -u -m hint_tpu.experiments.campaign compare \
            --family plus --kind conditional --run "$run" >> artifacts/compare_plus_r4.log 2>&1
        echo "[after_grid] $(date -u +%H:%M:%S) plus compare run $run rc=$?" >> "$LOG"
    done
fi

timeout 1800 python -u -m hint_tpu.experiments.campaign report >> "$LOG" 2>&1
echo "[after_grid] $(date -u +%H:%M:%S) all done" >> "$LOG"
