#!/usr/bin/env bash
# Probe the shared TPU until it answers, then run the round's TPU work queue
# in priority order: the quick standalone items first (divergence probes,
# per-family perf table), then the long ablation-grid resume (idempotent).
# The axon tunnel drops out for stretches; polling a tiny matmul in a fresh
# process is the only reliable liveness test.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/grid_log.txt
echo "[wait_tpu] $(date -u +%H:%M:%S) probing for TPU..." >> "$LOG"
while true; do
    if timeout 300 python -c "
import jax, jax.numpy as jnp
(jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
assert jax.devices()[0].platform != 'cpu'
" >/dev/null 2>&1; then
        echo "[wait_tpu] $(date -u +%H:%M:%S) TPU answered; running work queue" >> "$LOG"
        break
    fi
    echo "[wait_tpu] $(date -u +%H:%M:%S) TPU unavailable; retrying in 120s" >> "$LOG"
    sleep 120
done

# 1. divergence probes (minutes each; VERDICT r3 #2-mechanism)
timeout 2400 python -u tools/diverge_probe.py plus_shape.unconditional_hint_16_0_big 0 8 \
    >> artifacts/diverge_log.txt 2>&1
timeout 2400 python -u tools/diverge_probe.py plus_shape.unconditional_hint_16_1 1 20 \
    >> artifacts/diverge_log.txt 2>&1
# 2. per-family perf table + scan-vs-unroll compile A/B (VERDICT r3 #5/#4)
timeout 5400 python -u tools/perf_families.py >> artifacts/perf_families_log.txt 2>&1
# 3. the long tail: ablation-grid seeds (idempotent resume)
exec python -u -m hint_tpu.experiments.campaign grid >> "$LOG" 2>&1
