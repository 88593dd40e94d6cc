#!/bin/bash
# Round-5 TPU measurement runbook. Appends one labeled block per
# experiment to benchmarks/r5_measure.log so partial completion still
# leaves usable numbers.
#
#   bash benchmarks/r5_measure.sh [log_path]
#
# Experiments, in priority order (VERDICT r4 tasks 4, 5, 6, 8, 2):
#   1. dccrn A/B: packed dual-net complex LSTM through the fused scan
#      (BREVER_LSTM_MIN_ROWS=32) vs the round-4 XLA-scan default (128)
#      — target <=50 ms (VERDICT 5)
#   2. manner HLO byte census + step re-confirm (VERDICT 4 evidence)
#   3. sgmsepm census follow-ups (VERDICT 6)
#   4. tfgridnet per-op profile of the post-LSTM remainder (VERDICT 8)
#   5. driver-view headline confirm at current defaults

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r5_measure.log}
if ! mkdir /tmp/r5_runbook.lock 2>/dev/null; then
    echo "r5_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout 900 "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run dccrn_packed_fused env BREVER_LSTM_MIN_ROWS=32 \
    python benchmarks/bench_models.py dccrn
run dccrn_xla_scan env BREVER_LSTM_MIN_ROWS=128 \
    python benchmarks/bench_models.py dccrn
run manner_census python benchmarks/hlo_census.py manner 24
run manner_step python benchmarks/bench_models.py manner
run tfgridnet_profile python benchmarks/profile_step.py tfgridnet
run sgmsepm_census python benchmarks/hlo_census.py sgmsepm 24
run sgmsepm_profile python benchmarks/profile_step.py sgmsepm
run sgmsepm_step python benchmarks/bench_models.py sgmsepm
run vpu_dtype python benchmarks/bench_vpu_dtype.py
# AOT artifact cache A/B (VERDICT 3): build once, then measure the
# driver-view headline loading the executable from local disk
run bench_headline_aot_build env BENCH_ARCHS=convtasnet \
    BENCH_AOT_DIR=benchmarks/aot python bench.py
run bench_headline_aot_load env BENCH_ARCHS=convtasnet \
    BENCH_AOT_DIR=benchmarks/aot python bench.py
echo "ALL DONE $(date -u)" >> "$LOG"
