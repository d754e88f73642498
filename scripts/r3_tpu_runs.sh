#!/bin/bash
# Round-3 TPU measurement plan: run after the tunnel is confirmed up.
#   1. smoke bench at 2% scale (sanity + compile-cache warm)
#   2. full-scale bench, all three reference configs (headline numbers)
#   3. quality parity at 25% scale (regenerates QUALITY_r03.json with the
#      cold/warm wall split)
# ONE TPU process at a time; do not run the CPU test suite concurrently
# (host load slows remote compiles 5-30x). Logs land in /tmp/r3_runs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_runs

echo "=== smoke (scale 0.02) $(date -u) ==="
timeout 1800 python bench.py --scale=0.02 \
    > /tmp/r3_runs/smoke.json 2> /tmp/r3_runs/smoke.log
rc=$?
cat /tmp/r3_runs/smoke.json
if [ $rc -ne 0 ]; then
    echo "smoke failed rc=$rc — aborting plan" >&2
    exit $rc
fi

echo "=== full bench $(date -u) ==="
timeout 14400 python bench.py \
    > /tmp/r3_runs/bench_full.json 2> /tmp/r3_runs/bench_full.log
rc=$?
cat /tmp/r3_runs/bench_full.json
if [ $rc -ne 0 ]; then
    echo "full bench failed rc=$rc — continuing to quality" >&2
fi

echo "=== quality (scale 0.25) $(date -u) ==="
timeout 14400 python bench.py --quality \
    > /tmp/r3_runs/quality.json 2> /tmp/r3_runs/quality.log
rc=$?
cat QUALITY_r03.json 2>/dev/null
echo "=== done $(date -u) rc=$rc ==="
