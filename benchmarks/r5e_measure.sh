#!/bin/bash
# Round-5 runbook, fifth pass.
#
#   bash benchmarks/r5e_measure.sh [log_path]
#
#   1. MANNER flash-BN A/B with the C<=1536 cap (the r5d worker crash
#      was bisected to the C=1920 backward; every narrower shape class
#      passes standalone — /tmp/gn_repro*.log, PERF.md)
#   2. sgmsepm per-op profile at the new 219 ms defaults (rank-4 GN)
#   3. rebuild the AOT headline artifact, then a guarded driver bench

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r5e_measure.log}
if ! mkdir /tmp/r5e_runbook.lock 2>/dev/null; then
    echo "r5e_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    local tmo=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout "$tmo" "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run manner_flashbn_capped 1500 env BREVER_BN_FUSED=1 \
    python benchmarks/bench_models.py manner
run sgmsepm_profile_r5e 1200 python benchmarks/profile_step.py sgmsepm
run aot_rebuild 1200 env BENCH_AOT_DIR=benchmarks/aot \
    python benchmarks/bench_models.py convtasnet
run bench_headline_guarded 900 python bench.py
echo "ALL DONE $(date -u)" >> "$LOG"
rmdir /tmp/r5e_runbook.lock
