#!/usr/bin/env bash
# Round-close guard: make sure nothing of ours is still holding the TPU
# before the driver runs the official benchmark (bench.py).
#
# Round 3 lost its official perf record because a campaign-grid process and
# a starved pytest were still attached to the chip when the driver ran
# bench.py (BENCH_r03.json: rc=1, "Unable to initialize backend 'axon'").
# Run this before ending a round. It reports — and with --kill terminates —
# any python process in this repo that could be holding the backend.
#
# Never kills by pattern-match against arbitrary commands: it only considers
# python processes whose cwd is this repo, and never its own ancestors.
set -u

REPO="$(cd "$(dirname "$0")/.." && pwd)"
KILL=0
[ "${1:-}" = "--kill" ] && KILL=1

self_chain=" $$ $PPID "
pid="$PPID"
# collect the full ancestor chain so we never touch our own session
while [ "$pid" -gt 1 ] 2>/dev/null; do
    pid="$(awk '{print $4}' "/proc/$pid/stat" 2>/dev/null || echo 1)"
    self_chain="$self_chain$pid "
done

found=0
for proc in /proc/[0-9]*; do
    p="${proc#/proc/}"
    case "$self_chain" in *" $p "*) continue ;; esac
    exe="$(readlink "$proc/exe" 2>/dev/null)" || continue
    cwd="$(readlink "$proc/cwd" 2>/dev/null)" || continue
    case "$cwd" in "$REPO"*) ;; *) continue ;; esac
    cmd="$(tr '\0' ' ' < "$proc/cmdline" 2>/dev/null)"
    case "$exe" in
        *python*) ;;
        # shell wrappers of OUR OWN tools (supervisors/queues respawn python
        # children if only the child dies); still repo-cwd-scoped, still
        # never an arbitrary pattern. Matches RELATIVE invocations too —
        # round 5's `bash tools/r5_supervise.sh` carried no $REPO prefix in
        # its cmdline, so the absolute-only pattern would have left the
        # supervisor alive to respawn the queue into the driver's bench.
        *bash* | *dash | */sh)
            case "$cmd" in *tools/*.sh*) ;; *) continue ;; esac ;;
        *) continue ;;
    esac
    found=1
    if [ "$KILL" -eq 1 ]; then
        echo "killing $p: $cmd"
        kill "$p" 2>/dev/null
    else
        echo "HOLDING CHIP? pid=$p: $cmd"
    fi
done

if [ "$found" -eq 0 ]; then
    echo "clean: no repo-local python processes running"
    exit 0
fi
[ "$KILL" -eq 1 ] && exit 0
echo "re-run with --kill to terminate the processes above"
exit 1
