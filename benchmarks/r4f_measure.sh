#!/bin/bash
# Round-4f runbook:
#   1. tfgridnet scan-blocks A/B under flash-LSTM v2 + all-rows tile —
#      the r3 negative result (inline 99.6 vs scan 115.6 ms) predates
#      the fused kernels; the per-op profile now shows a 27.9 ms tail
#      of 7260 tiny ops, and scanning the 6 grid blocks would cut that
#      op count ~6x. Re-measure both points same-day.
#   2. guarded bench.py headline repeat (final bench.py with the
#      deadline watchdog; evidence for VERDICT r3 #2).
#
#   bash benchmarks/r4f_measure.sh [log_path]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r4_measure.log}
if ! mkdir /tmp/r4f_runbook.lock 2>/dev/null; then
    echo "r4f_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout 900 "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run tfgridnet_scanblocks_flash env BENCH_TFGRIDNET_SCAN=1 \
    python benchmarks/bench_models.py tfgridnet
run tfgridnet_inline_confirm python benchmarks/bench_models.py tfgridnet
run bench_headline_guarded_2 python bench.py
echo "R4F ALL DONE $(date -u)" >> "$LOG"
