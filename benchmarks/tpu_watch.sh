#!/bin/bash
# Poll the tunneled TPU backend; run the round-3 measurement runbook as
# soon as it answers. Probe happens in a throwaway subprocess because a
# wedged tunnel makes jax.devices() block forever in-process.
#
#   bash benchmarks/tpu_watch.sh [max_hours]
cd "$(dirname "$0")/.."
MAX_H=${1:-11}
END=$(( $(date +%s) + MAX_H * 3600 ))
i=0
while [ "$(date +%s)" -lt "$END" ]; do
    i=$((i + 1))
    if timeout 120 python -c \
        'import jax,sys; d=jax.devices(); sys.exit(0 if d and d[0].platform!="cpu" else 1)' \
        >/dev/null 2>&1; then
        echo "TPU UP at $(date -u) (probe $i) — running runbook"
        bash benchmarks/r3_measure.sh
        exit 0
    fi
    echo "probe $i: down $(date -u +%H:%M:%S)"
    sleep 240
done
echo "GAVE UP at $(date -u)"
