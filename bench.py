"""Benchmark driver: per-arch TPU train-step timing, FLOPs and MFU.

Prints ONE JSON line with the headline Conv-TasNet number:

    {"metric", "value" (steps/s), "unit", "vs_baseline" (= MFU, the
     fraction of the device's dense-bf16 peak the step sustains),
     "archs" (per-architecture detail)}

``vs_baseline`` is the model-FLOPs-utilization of the flagship step —
the honest efficiency measure on this hardware. The reference repo
publishes no benchmark numbers (BASELINE.md) and no reference GPU is
reachable here, so a speed *ratio* against the reference would have to
compare against the reference architecture on this host's CPU, which
is degenerate (>1000x) and says nothing. Full per-arch details are
also written to benchmarks/bench_detail.json.

Workload: full forward+backward+Adam update, bf16 compute with fp32
master params, batch 16 x 4 s @ 16 kHz (memory-bound archs at their
real reduced batch, see benchmarks/bench_models.py:ARCH_BATCH).
"""

import json
import os
import sys


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    from benchmarks.bench_models import DEFAULT_ARCHS, bench_all

    archs = os.environ.get('BENCH_ARCHS', '').split() or DEFAULT_ARCHS
    results = bench_all(archs)

    detail_path = os.path.join(here, 'benchmarks', 'bench_detail.json')
    with open(detail_path, 'w') as f:
        json.dump(results, f, indent=2)

    head = results.get('convtasnet') or next(iter(results.values()))
    device = head['device']
    print(json.dumps({
        'metric': f"convtasnet_train_steps_per_sec (batch {head['batch']} "
                  f"x {head['seconds_per_item']}s @ 16kHz, bf16, {device}; "
                  'vs_baseline = MFU vs dense-bf16 peak)',
        'value': head['steps_per_sec'],
        'unit': 'steps/s',
        'vs_baseline': head['mfu'],
        'archs': {
            a: {k: r[k] for k in ('batch', 'ms_per_step', 'steps_per_sec',
                                  'flops_per_step', 'achieved_tflops',
                                  'mfu', 'bytes_per_step', 'mxu_floor_ms',
                                  'hbm_floor_ms', 'hbm_roofline_frac')}
            for a, r in results.items()
        },
    }))


if __name__ == '__main__':
    main()
