#!/bin/bash
# Round-3 TPU measurement plan: run after the tunnel is confirmed up.
#   1. smoke bench at 2% scale (sanity + compile-cache warm)
#   2. full-scale bench, all three reference configs (headline numbers)
#   3. preserve the evidence in-repo (artifacts/ + README table) and commit
#   4. quality parity at 25% scale (regenerates QUALITY_r03.json — the
#      committed artifact predates the cubic-LS/ray solver changes, so it
#      must be refreshed; skip with --no-quality)
# ONE TPU process at a time; do not run the CPU test suite concurrently
# (host load slows remote compiles 5-30x). Logs land in /tmp/r3_runs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_runs artifacts
STAMP=$(date -u +%Y%m%dT%H%M%S)

echo "=== smoke (scale 0.02) $(date -u) ==="
timeout 1800 python bench.py --scale=0.02 \
    > /tmp/r3_runs/smoke.json 2> /tmp/r3_runs/smoke.log
rc=$?
cat /tmp/r3_runs/smoke.json
if [ $rc -ne 0 ]; then
    echo "smoke failed rc=$rc — aborting plan" >&2
    tail -5 /tmp/r3_runs/smoke.log >&2
    exit $rc
fi

echo "=== full bench $(date -u) ==="
timeout 14400 python bench.py \
    > /tmp/r3_runs/bench_full.json 2> /tmp/r3_runs/bench_full.log
rc=$?
cat /tmp/r3_runs/bench_full.json
if [ $rc -eq 0 ] && [ -s /tmp/r3_runs/bench_full.json ]; then
    # Preserve the measurement in-repo even if nobody is at the console:
    # raw rows + the stderr accounting (achieved GB/s, floors, medians).
    cp /tmp/r3_runs/bench_full.json "artifacts/bench_${STAMP}.jsonl"
    cp /tmp/r3_runs/bench_full.log "artifacts/bench_${STAMP}.log"
    python scripts/update_readme_table.py "artifacts/bench_${STAMP}.jsonl" \
        --date="$(date -u +%Y-%m-%d)" || true
    git add artifacts README.md
    git commit -m "Record full-scale TPU bench run ${STAMP} (tunnel recovery)" \
        || true
else
    echo "full bench failed rc=$rc — not committing" >&2
    tail -5 /tmp/r3_runs/bench_full.log >&2
fi

if [ "${1:-}" != "--no-quality" ]; then
    echo "=== quality (scale 0.25) $(date -u) ==="
    timeout 14400 python bench.py --quality \
        > /tmp/r3_runs/quality.json 2> /tmp/r3_runs/quality.log
    rc=$?
    cat QUALITY_r03.json 2>/dev/null
    if [ $rc -eq 0 ] && [ -f QUALITY_r03.json ]; then
        git add QUALITY_r03.json
        git commit -m "Refresh 25%-scale quality parity artifact (${STAMP})" \
            || true
    fi
fi
echo "=== done $(date -u) rc=$rc ==="
