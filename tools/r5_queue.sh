#!/usr/bin/env bash
# Round-5 TPU work queue — value-first (VERDICT r4 #6): the 1e8-GT lens
# conditional comparison lands FIRST, then plus, then grid seed-2 fill-ins,
# then perf. One TPU process at a time; every stage is idempotent, so
# re-invoking this script resumes wherever a cut left off. Each stage logs
# to artifacts/r5_<stage>.log and the queue narrates to stdout.
set -u
cd "$(dirname "$0")/.."
Q() { echo "[r5-queue $(date +%H:%M:%S)] $*"; }

run() { # run <name> <cmd...>
    local name="$1"; shift
    Q "stage $name: $*"
    "$@" > "artifacts/r5_${name}.log" 2>&1
    local rc=$?
    Q "stage $name: rc=$rc ($(tail -1 "artifacts/r5_${name}.log" | head -c 160))"
    return $rc
}

# ---- 0. wait for the TPU tunnel to answer ------------------------------------
# A client started while the tunnel is down blocks forever in device init at
# 0% CPU; the supervisor only reaps that after 35 min of log silence. Probing
# here turns each dead-tunnel cycle into ~3 min, and the probe lines keep
# queue.out fresh so the supervisor never kills the probing loop itself.
# the probe must run a real computation: device *enumeration* is answered
# locally by the plugin and passes even when the data path is dead
until timeout -k 10 120 python -c \
    'import jax, jax.numpy as jnp
d = jax.devices()
assert d[0].platform != "cpu", d
x = jax.jit(lambda v: (v * 2).sum())(jnp.ones(128)).block_until_ready()
assert float(x) == 256.0, x
print("probe ok", d)' \
    > /dev/null 2>&1
do
    Q "tpu tunnel not answering (120s probe); retrying in 60s"
    sleep 60
done
Q "tpu tunnel ok"

# ---- 1. lens pool (resume/no-op if complete) --------------------------------
run pool_lens python tools/pool_tpu.py lens 100000000 || exit 1

# ---- 2. tie-break validation: TPU gen now, CPU recheck overlapped ----------
# Valid = 100k rows, ZERO disagreement, and the result postdates the engine
# (a lens_tpu.py change invalidates the audit — this is what caught the
# bf16-matmul trace bug on 2026-08-19). A recheck already in flight counts
# as pending, not missing, so a queue restart doesn't re-burn TPU time.
tiebreak_ok() {
    [ artifacts/lens_tiebreak_validation.json -nt hint_tpu/data/lens_tpu.py ] \
        2>/dev/null || return 1
    python -c 'import json,sys;d=json.load(open("artifacts/lens_tiebreak_validation.json"));sys.exit(0 if d["n_rows"]==100000 and d["disagree_rows"]==0 else 1)' 2>/dev/null
}
recheck_alive() {
    [ -f /tmp/r5_recheck.pid ] && kill -0 "$(cat /tmp/r5_recheck.pid)" 2>/dev/null
}
if ! tiebreak_ok; then
    if recheck_alive; then
        Q "tie-break f64 recheck already running (pid $(cat /tmp/r5_recheck.pid))"
    else
        if [ ! artifacts/tiebreak_rows.npz -nt hint_tpu/data/lens_tpu.py ] 2>/dev/null; then
            run tiebreak_gen python tools/validate_tiebreak.py 100000 16384 --gen-only
        fi
        Q "tie-break f64 recheck running in background (CPU)"
        # setsid: detach from the queue's process group so a supervisor
        # stall-kill of the queue PGID doesn't take the recheck down too
        nohup setsid python tools/validate_tiebreak.py 100000 16384 --recheck \
            > artifacts/r5_tiebreak_recheck.log 2>&1 &
        echo $! > /tmp/r5_recheck.pid
    fi
fi

# ---- 3. lens GT posteriors vs the 1e8 pool (fresh targets) ------------------
run gt_lens python tools/precompute_gt_fresh.py lens 1000

# ---- 4-5. the headline: per run r, retrain seed r then compare run r --------
# Interleaved value-first: a tunnel death after "train everything" leaves
# zero compares; train seed 0 -> compare run 0 lands the headline number
# ~50 min earlier and each completed r is a publishable data point.
LENS_COND="lens_shape.conditional_cinn_1 lens_shape.conditional_cinn_2 \
lens_shape.conditional_cinn_4 lens_shape.conditional_cinn_8 \
lens_shape.conditional_hint_1_full lens_shape.conditional_hint_2_full \
lens_shape.conditional_hint_4_full lens_shape.conditional_hint_8_full"
for r in 0 1 2; do
    run train_lens_cond_$r python -m hint_tpu.experiments.campaign train \
        --family lens --require-ckpt --seeds "$r" --configs $LENS_COND
    run compare_lens_$r python -m hint_tpu.experiments.campaign compare \
        --family lens --kind conditional --run "$r"
done

# ---- 6. cheap, high-value stages land before the multi-hour plus build ------
# (resequenced mid-round: at the measured compare rate the plus family ends
# ~05:00 and grid seed-2 cannot fit; the perf remeasure fixes a committed
# artifact the round-4 verdict called not-credible, so it must not queue
# behind 3h of pool building. All stages stay idempotent.)

# ---- 6a. probe the two uninvestigated seed-2 divergences ---------------------
[ -f artifacts/diverge_unconditional_hint_16_1_s2.json ] || \
    run probe_hint16 python tools/diverge_probe.py plus_shape.unconditional_hint_16_1 2
[ -f artifacts/diverge_unconditional_inn_32_s2.json ] || \
    run probe_inn32 python tools/diverge_probe.py plus_shape.unconditional_inn_32 2

# ---- 6b. perf families (UCI rows + bf16 conditional + fixed roofline) --------
run perf python tools/perf_families.py
run perf_table python tools/perf_table_md.py --write

# ---- 6c. archive what exists so far + refresh the published report -----------
run archive python tools/archive_comparisons.py r5
run report python -m hint_tpu.experiments.campaign report

# ---- 7. plus pool: honest rate first, then the build ------------------------
if [ ! -f artifacts/pool_rate_plus.json ]; then
    run rate_plus python tools/time_pool_engine.py plus 2097152
fi
run pool_plus python tools/pool_tpu.py plus 100000000 || exit 1

# ---- 8-9. plus conditional: GT, then per run r retrain + compare ------------
run gt_plus python tools/precompute_gt_fresh.py plus 1000
PLUS_COND="plus_shape.conditional_cinn_4 plus_shape.conditional_hint_4_full"
for r in 0 1 2; do
    run train_plus_cond_$r python -m hint_tpu.experiments.campaign train \
        --family plus --require-ckpt --seeds "$r" --configs $PLUS_COND
    run compare_plus_$r python -m hint_tpu.experiments.campaign compare \
        --family plus --kind conditional --run "$r"
done

# ---- 10. re-archive + re-report with the plus results ------------------------
run archive2 python tools/archive_comparisons.py r5
run report2 python -m hint_tpu.experiments.campaign report

# ---- 11. ablation grid seed 2 (27 remaining configs; lowest-priority tail) ---
run grid_s2 python -m hint_tpu.experiments.campaign grid --seeds 2
run report3 python -m hint_tpu.experiments.campaign report
Q "queue complete"
