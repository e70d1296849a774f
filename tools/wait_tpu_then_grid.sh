#!/usr/bin/env bash
# Probe the shared TPU until it answers, then launch the ablation grid
# (idempotent resume). The axon tunnel drops out for stretches; polling a
# tiny matmul in a fresh process is the only reliable liveness test.
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
        echo "[wait_tpu] $(date -u +%H:%M:%S) TPU answered; launching grid" >> "$LOG"
        break
    fi
    echo "[wait_tpu] $(date -u +%H:%M:%S) TPU unavailable; retrying in 120s" >> "$LOG"
    sleep 120
done
exec python -u -m hint_tpu.experiments.campaign grid >> "$LOG" 2>&1
