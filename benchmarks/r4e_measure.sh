#!/bin/bash
# Round-4e runbook: confirm the shipped headline after the
# all-scratch-row TCN backward landed (45.0 -> 40.9 ms in the per-arch
# bench; the last driver-view bench.py runs predate it), then turn the
# byte-census/profile tooling on dccrn and manner — the two archs that
# never got one (dccrn sits at 76% of byte roofline with headroom;
# manner at 96% to confirm there is none).
#
#   bash benchmarks/r4e_measure.sh [log_path]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r4_measure.log}
if ! mkdir /tmp/r4e_runbook.lock 2>/dev/null; then
    echo "r4e_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout 900 "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

# VERDICT r3 task 2 "done" = two consecutive driver-view runs with
# >=50% of the ~600 s budget spare, at the shipped defaults
run bench_headline_r4e_1 python bench.py
run bench_headline_r4e_2 python bench.py
# where do dccrn's bytes go (fused complex conv halved them; what is
# the remaining 76%-of-roofline made of — BN xhat buffers would be the
# same multi-consumer-f32 pattern flash-GN removed from sgmse)
run dccrn_hlo_census python benchmarks/hlo_census.py dccrn 14
run profile_dccrn python benchmarks/profile_step.py dccrn 5
run manner_hlo_census python benchmarks/hlo_census.py manner 14
echo "R4E ALL DONE $(date -u)" >> "$LOG"
