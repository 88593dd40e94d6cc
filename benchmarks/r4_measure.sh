#!/bin/bash
# Round-4 TPU measurement runbook: run as soon as the tunnel is live.
# Appends one labeled block per experiment to benchmarks/r4_measure.log
# so partial completion still leaves usable numbers.
#
#   bash benchmarks/r4_measure.sh [log_path]
#
# Experiments, in priority order:
#   1. driver-view bench.py headline, twice — the round-4 defaults
#      (TCN tile 2048) must land with >=50% of the ~600 s budget spare
#   2. tfgridnet at its new defaults (flash-LSTM + inline blocks, no
#      env flags) — VERDICT r3 task 1 wants <=80 ms as-default
#   3. the runbook tail that never ran in round 3: metric device twins
#      vs host+d2h, device-resident GAN scoring, inference/streaming
#   4. sgmsepm current state (baseline for the round-4 skip-batching
#      work) and a dccrn/manner confirm of the r3 numbers

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r4_measure.log}
# single-runner guard: two watchers may race to start this on one chip
if ! mkdir /tmp/r4_runbook.lock 2>/dev/null; then
    echo "r4_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout 900 "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run bench_headline_1 env BENCH_ARCHS=convtasnet python bench.py
run bench_headline_2 env BENCH_ARCHS=convtasnet python bench.py
run tfgridnet_default python benchmarks/bench_models.py tfgridnet
run metrics_device python benchmarks/bench_metrics.py 16 4
run metricgan_device_scoring env BENCH_GAN_DEVICE_SCORING=1 \
    python benchmarks/bench_models.py metricganokd
run inference python benchmarks/bench_inference.py
run sgmsepm python benchmarks/bench_models.py sgmsepm
run dccrn python benchmarks/bench_models.py dccrn
run manner python benchmarks/bench_models.py manner
echo "ALL DONE $(date -u)" >> "$LOG"
