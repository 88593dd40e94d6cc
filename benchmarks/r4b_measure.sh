#!/bin/bash
# Round-4 continuation runbook: the metrics_device remainder (rc=124 in
# the main r4 pass — the device-ESTOI compile alone was 738 s of the
# 900 s step budget) split per metric so each twin's compile gets its
# own timeout, plus a third headline repeat for the compile-variance
# record (140.8 s vs 412.0 s observed for the identical tile-2048
# config).
#
#   bash benchmarks/r4b_measure.sh [log_path]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-benchmarks/r4_measure.log}
if ! mkdir /tmp/r4b_runbook.lock 2>/dev/null; then
    echo "r4b_measure already running/ran; exiting" >> "$LOG"
    exit 0
fi

run() {
    local label=$1; shift
    echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
    ( time timeout 900 "$@" ) >> "$LOG" 2>&1
    echo "--- rc=$? ---" >> "$LOG"
}

run metrics_device_stoi env BENCH_METRICS_KEYS=stoi \
    python benchmarks/bench_metrics.py 16 4
run metrics_device_pesq env BENCH_METRICS_KEYS=pesq \
    python benchmarks/bench_metrics.py 16 4
run metrics_device_estoi_host env BENCH_METRICS_KEYS=estoi \
    python benchmarks/bench_metrics.py 16 4
run bench_headline_3 env BENCH_ARCHS=convtasnet python bench.py
# where do sgmsepm's 251 GB/step go, per the TPU compiler's own
# accounting (drives the round-4 skip/GN byte work)
run sgmse_hlo_census python benchmarks/hlo_census.py sgmsepm 14
# isolate the r3 fused GroupNorm+SiLU (403.4 vs 389.4 ms was measured
# across rounds, never A/B'd in isolation — VERDICT r3 task 4)
run sgmsepm_fused_gn_off env BREVER_FUSED_GN=0 \
    python benchmarks/bench_models.py sgmsepm
# re-measure inference with the scalar-fetch fence (block_until_ready
# proved not to fence on this backend: convtasnet read 0.3 ms vs the
# ~30 ms RTT floor of every other arch)
run inference_scalar_fence python benchmarks/bench_inference.py
echo "R4B ALL DONE $(date -u)" >> "$LOG"
