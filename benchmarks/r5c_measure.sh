#!/bin/bash
# Round-5 runbook, third pass: A/Bs of the two levers built this round.
#
#   bash benchmarks/r5c_measure.sh [log_path]
#
#   1. MANNER flash-BN (new default: BatchNorm+act fused via the GN
#      kernel) vs the unfused path (BREVER_FUSED_GN=0 keeps the kernel
#      out of group_norm_silu AND flash-BN respects gn_pallas_available,
#      so gate with BREVER_BN_FUSED=0) — target <=75 ms (VERDICT r4 #4)
#   2. sgmsepm shift-mode FIR resampler vs the grouped default
#      (BREVER_RESAMPLE_MODE) — the round-4 census's 64.5 GB pad:bf16
#      (VERDICT r4 #6)

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r5c_measure.log}
if ! mkdir /tmp/r5c_runbook.lock 2>/dev/null; then
    echo "r5c_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    local tmo=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout "$tmo" "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

# manner compiled in 793 s yesterday at defaults; flash-BN adds Pallas
# instances, so give the A/B arms headroom over the usual 900 s
run manner_flashbn 1500 python benchmarks/bench_models.py manner
run manner_unfused 1500 env BREVER_BN_FUSED=0 \
    python benchmarks/bench_models.py manner
run sgmsepm_shift_resample 1200 env BREVER_RESAMPLE_MODE=shift \
    python benchmarks/bench_models.py sgmsepm
echo "ALL DONE $(date -u)" >> "$LOG"
rmdir /tmp/r5c_runbook.lock
