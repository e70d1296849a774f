#!/usr/bin/env bash
# Stall-hardened wrapper around tools/r5_queue.sh.
#
# Observed twice (r4 reboot aftermath, r5 session cut): the TPU tunnel can
# die under a client, leaving the process blocked forever on a gRPC futex
# with zero CPU. Every queue stage is idempotent/chunk-resumable, so the
# cheap fix is supervision: run the queue in its own process group and
# restart it whenever no r5 log has been touched for STALL_S seconds.
# Kills are by recorded PGID only — never by pattern.
set -u
cd "$(dirname "$0")/.."
STALL_S=${STALL_S:-2100}     # > the ~25 min worst-case silent train unit
MAX_RESTARTS=${MAX_RESTARTS:-40}
restarts=0
echo $$ > /tmp/r5_supervise.pid   # recorded-PID kill path for round close
while [ "$restarts" -le "$MAX_RESTARTS" ]; do
    setsid bash tools/r5_queue.sh >> artifacts/r5_queue.out 2>&1 &
    QPID=$!
    echo "$QPID" > /tmp/r5_queue.pid
    echo "[supervise $(date +%H:%M:%S)] queue started pid $QPID (restart $restarts)"
    while kill -0 "$QPID" 2>/dev/null; do
        sleep 60
        newest=$(ls -t artifacts/r5_*.log artifacts/r5_queue.out 2>/dev/null | head -1)
        [ -z "$newest" ] && continue
        age=$(( $(date +%s) - $(stat -c %Y "$newest") ))
        if [ "$age" -gt "$STALL_S" ]; then
            echo "[supervise $(date +%H:%M:%S)] stall: $newest idle ${age}s — killing pgid $QPID"
            kill -TERM -- "-$QPID" 2>/dev/null
            sleep 10
            kill -KILL -- "-$QPID" 2>/dev/null
            break
        fi
    done
    wait "$QPID" 2>/dev/null
    if grep -q "queue complete" artifacts/r5_queue.out 2>/dev/null; then
        echo "[supervise $(date +%H:%M:%S)] queue complete"
        exit 0
    fi
    restarts=$((restarts + 1))
    sleep 20
done
echo "[supervise] giving up after $MAX_RESTARTS restarts"
exit 1
