#!/bin/bash
# Round-3 TPU measurement runbook: run as soon as the tunnel is live.
# Appends one labeled block per experiment to benchmarks/r3_measure.log
# so partial completion still leaves usable numbers.
#
#   bash benchmarks/r3_measure.sh [log_path]
#
# Experiments, in priority order (round-3 final ordering):
#   1. driver-view bench.py headline, twice (must land inside ~600 s)
#   2. tfgridnet flash-LSTM and the convtasnet tile-4096 point — the
#      two highest-value unknowns
#   3. per-arch sweep (sgmsepm / dccrn / manner / metricganokd), the
#      tfgridnet flash+inline / scan / inline A/B, ffnn
#   4. remaining tile points (2048/512) + per-kernel micro-benches
#   5. metric twins, device-resident GAN scoring, inference/streaming

set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r3_measure.log}
# single-runner guard: two watchers may race to start this on one chip
if ! mkdir /tmp/r3_runbook.lock 2>/dev/null; then
    echo "r3_measure already running/ran; exiting" >> "$LOG"
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
# flash-LSTM Pallas scan (VERDICT r2 #2): parity is interpreter-pinned,
# step time is the open question — this is the first hardware timing
run tfgridnet_flash env BREVER_FUSED_LSTM=1 \
    python benchmarks/bench_models.py tfgridnet
# flash-TCN time-tile sweep: larger tiles = fewer chunk-loop
# boundaries per VMEM pass (VERDICT r2 #3: close convtasnet toward its
# 20-25 ms matmul floor)
run convtasnet_tile4096 env BREVER_TCN_TILE=4096 \
    python benchmarks/bench_models.py convtasnet
run sgmsepm python benchmarks/bench_models.py sgmsepm
run dccrn python benchmarks/bench_models.py dccrn
run manner python benchmarks/bench_models.py manner
run metricganokd python benchmarks/bench_models.py metricganokd
run tfgridnet_flash_inline env BREVER_FUSED_LSTM=1 BENCH_TFGRIDNET_INLINE=1 \
    python benchmarks/bench_models.py tfgridnet
run tfgridnet_scan python benchmarks/bench_models.py tfgridnet
run tfgridnet_inline env BENCH_TFGRIDNET_INLINE=1 \
    python benchmarks/bench_models.py tfgridnet
run ffnn python benchmarks/bench_models.py ffnn
run convtasnet_tile2048 env BREVER_TCN_TILE=2048 \
    python benchmarks/bench_models.py convtasnet
run convtasnet_tile512 env BREVER_TCN_TILE=512 \
    python benchmarks/bench_models.py convtasnet
# per-kernel signal for the same sweep (isolates one block from the
# 24-block model sum)
run tcn_kernel_tile1024 python benchmarks/bench_tcn_kernel.py
run tcn_kernel_tile4096 env BREVER_TCN_TILE=4096 \
    python benchmarks/bench_tcn_kernel.py
# on-device metric twins vs host scoring (incl. the d2h fetch cost the
# host path pays on the tunnel)
run metrics_device python benchmarks/bench_metrics.py 16 4
# fully device-resident GAN step (PESQ targets scored in-graph)
run metricgan_device_scoring env BENCH_GAN_DEVICE_SCORING=1 \
    python benchmarks/bench_models.py metricganokd
# inference latency / RTF (serving shapes) + streaming step
run inference python benchmarks/bench_inference.py
echo "ALL DONE $(date -u)" >> "$LOG"
