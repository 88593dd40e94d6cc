#!/bin/bash
# Round-5 runbook, second pass: the items the first pass lost to
# compile weather (r5_measure.log rc=124 entries + the manner census).
#
#   bash benchmarks/r5b_measure.sh [log_path]
#
#   1. VPU dtype micro-bench (gates the bf16 flash-TCN backward
#      direction — VERDICT r4 #2)
#   2. MANNER HLO byte census (VERDICT r4 #4 evidence)
#   3. sgmsepm per-op profile (VERDICT r4 #6 evidence)

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r5b_measure.log}
if ! mkdir /tmp/r5b_runbook.lock 2>/dev/null; then
    echo "r5b_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout 900 "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run vpu_dtype python benchmarks/bench_vpu_dtype.py
run manner_census python benchmarks/hlo_census.py manner 24
run sgmsepm_profile python benchmarks/profile_step.py sgmsepm
echo "ALL DONE $(date -u)" >> "$LOG"
rmdir /tmp/r5b_runbook.lock
