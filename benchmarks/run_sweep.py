"""Refresh ``bench_detail_full.json`` with a fresh per-arch TPU sweep.

One subprocess per architecture so a single wedged compile (the tunnel
has been observed to hang for hours) costs only that arch: every
completed arch is merged into the JSON immediately, preserving entries
for archs not swept this run.

Usage: python benchmarks/run_sweep.py [arch ...]   (default: all)
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.environ.get('SWEEP_OUT') \
    or os.path.join(HERE, 'bench_detail_full.json')
TIMEOUT_S = int(os.environ.get('SWEEP_TIMEOUT_S', '900'))

ARCHS = sys.argv[1:] or ['ffnn', 'tfgridnet', 'dccrn', 'manner',
                         'sgmsepm', 'metricganokd', 'convtasnet']


def main():
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    for arch in ARCHS:
        code = (
            "import json, os, sys\n"
            "if os.environ.get('SWEEP_CPU'):\n"
            "    import jax\n"
            "    jax.config.update('jax_platforms', 'cpu')\n"
            f"sys.path.insert(0, {HERE!r})\n"
            "import bench_models as bm\n"
            f"r = bm.bench_all([{arch!r}])\n"
            "print('SWEEP_JSON::' + json.dumps(r))\n"
        )
        print(f'# sweep: {arch}', flush=True)
        try:
            p = subprocess.run([sys.executable, '-c', code], cwd=ROOT,
                               capture_output=True, text=True,
                               timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            print(f'# sweep: {arch} TIMEOUT after {TIMEOUT_S}s', flush=True)
            continue
        sys.stdout.write(p.stdout)
        sys.stderr.write(p.stderr)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith('SWEEP_JSON::'):
                rec = json.loads(line[len('SWEEP_JSON::'):])
        if not rec:
            print(f'# sweep: {arch} produced no result (rc={p.returncode})',
                  flush=True)
            continue
        merged.update(rec)
        # atomic update: an interrupt mid-dump must not truncate the
        # preserved entries for archs not swept this run
        tmp = OUT + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(merged, f, indent=1)
            f.write('\n')
        os.replace(tmp, OUT)
        print(f'# sweep: {arch} recorded', flush=True)
    print('SWEEP DONE', flush=True)


if __name__ == '__main__':
    main()
