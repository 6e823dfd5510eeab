#!/usr/bin/env bash
# Serial TPU job queue with retry.  The axon chip is single-tenant, so all
# TPU work funnels through this one runner while CPU-side development
# continues in the foreground.  Sporadic infra-level device faults
# (UNAVAILABLE kernel fault) kill long processes; every job runs under
# timeout + retry, and the runners it invokes persist per-value /
# per-chunk / per-iteration progress for cheap resume.
#
# Usage:
#   nohup scripts/tpuq.sh >/dev/null 2>&1 &       # start the runner
#   cp myjob.job .tpuq/pending/NNN-name.job       # enqueue (sorted order)
#   touch .tpuq/STOP                              # drain and exit
#
# A job file is a bash snippet run from the repo root.  Optional directive:
#   # timeout: SECONDS     (default 5400)
set -u
cd "$(dirname "$0")/.."
Q=.tpuq
mkdir -p "$Q/pending" "$Q/done" "$Q/failed" "$Q/logs"
echo $$ > "$Q/runner.pid"

while true; do
    job=$(ls "$Q/pending" 2>/dev/null | sort | head -1)
    if [ -z "$job" ]; then
        if [ -f "$Q/STOP" ]; then
            rm -f "$Q/STOP" "$Q/runner.pid"
            exit 0
        fi
        sleep 20
        continue
    fi
    name="${job%.job}"
    log="$Q/logs/$name.log"
    t=$(sed -n 's/^# timeout: //p' "$Q/pending/$job" | head -1)
    t=${t:-5400}
    ok=0
    for attempt in 1 2 3 4 5 6; do
        echo "=== $name attempt $attempt $(date -u +%F' '%H:%M:%S) (timeout ${t}s)" >> "$log"
        if timeout "$t" bash "$Q/pending/$job" >> "$log" 2>&1; then
            ok=1
            break
        fi
        echo "=== $name attempt $attempt failed rc=$? $(date -u +%H:%M:%S)" >> "$log"
        sleep 15
    done
    if [ "$ok" = 1 ]; then
        echo "=== $name DONE $(date -u +%F' '%H:%M:%S)" >> "$log"
        mv "$Q/pending/$job" "$Q/done/"
    else
        echo "=== $name FAILED after 6 attempts" >> "$log"
        mv "$Q/pending/$job" "$Q/failed/"
    fi
done
