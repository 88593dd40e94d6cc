#!/bin/bash
# Round-5 runbook, fourth pass.
#
#   bash benchmarks/r5d_measure.sh [log_path]
#
#   1. MANNER flash-BN retry after the identity-group fix (the first
#      attempt OOM'd scoped VMEM on the C=1920 segment matrix)
#   2. sgmsepm at new defaults: rank-4 flash-GN (no reshape copies),
#      grouped resampler — isolates the rank-4 win from the shift arm
#      measured in r5c

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r5d_measure.log}
if ! mkdir /tmp/r5d_runbook.lock 2>/dev/null; then
    echo "r5d_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    local tmo=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout "$tmo" "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run manner_flashbn 1500 python benchmarks/bench_models.py manner
run sgmsepm_rank4gn 1200 python benchmarks/bench_models.py sgmsepm
echo "ALL DONE $(date -u)" >> "$LOG"
rmdir /tmp/r5d_runbook.lock
