#!/usr/bin/env bash
# Re-run the lens conditional comparison against the 1e8-row quantile-ABC
# ground truth (reference scale, rejection_sampling.py:76), after archiving
# every artifact derived from the old 1e7 pool (VERDICT r3 #3).
#
# Prereq: abc/lens-shape1_{x,y}_huge.npy hold 1e8 rows (pool build done).
# Runs the three training-run sweeps sequentially; each is idempotent and
# checkpoint-resumable (.partial files), so rerunning this script resumes.
set -eu
cd "$(dirname "$0")/.."

rows=$(python - <<'EOF'
import numpy as np
print(np.load("abc/lens-shape1_x_huge.npy", mmap_mode="r").shape[0])
EOF
)
if [ "$rows" -lt 100000000 ]; then
    echo "pool has only $rows rows (< 1e8) — finish the pool build first" >&2
    exit 1
fi

ARCH=abc/pool1e7_archive
# per-target GT posteriors + comparisons computed against the 1e7 pool; the
# GT conditional correlation cache in data/ is pool-derived too. Skip when
# the archive already exists (tools/precompute_lens_gt.py archives the same
# set and then REBUILDS abc/lens-shape1 with 1e8-pool GT — don't move that).
if [ ! -d "$ARCH" ]; then
    mkdir -p "$ARCH"
    for p in abc/lens-shape1 abc/lens-shape1_conditional_comparison_*.pkl \
             data/lens-shape1_corr_conditional_sample.npy data/lens-shape1_corr_conditional.npy; do
        [ -e "$p" ] && mv "$p" "$ARCH/" && echo "archived $p"
    done
fi

for run in 0 1 2; do
    python -m hint_tpu.experiments.campaign compare \
        --family lens --kind conditional --run "$run"
done
echo "done; regenerate the report with: python -m hint_tpu.experiments.campaign report"
