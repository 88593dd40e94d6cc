"""Digest an r5_e2e run: training-loop throughput + loss trajectory
from log_train.log, and held-out enhancement scores from scores.hdf5.

Usage: python benchmarks/r5_e2e_digest.py <model_dir> <test_dset>

Prints a JSON summary (also appended to benchmarks/r5_e2e_digest.json)
with in-loop steps/s (vs the synthetic-batch bench number), the loss
curve, and per-metric input/output means on the held-out test set —
the evidence VERDICT r4 item 1 asks for.
"""

import json
import os
import re
import sys

import numpy as np


def parse_train_log(model_dir):
    path = os.path.join(model_dir, 'log_train.log')
    epochs = []
    with open(path) as f:
        for line in f:
            m = re.search(r'Epoch (\d+): train loss: ([-\d.e+]+)', line)
            if m:
                entry = {'epoch': int(m.group(1)),
                         'train_loss': float(m.group(2))}
                v = re.search(r'val loss: ([-\d.e+]+)', line)
                if v:
                    entry['val_loss'] = float(v.group(1))
                mm = re.search(r"metrics: (\{.*\})", line)
                if mm:
                    entry['metrics'] = mm.group(1)
                epochs.append(entry)
            t = re.search(r'Epoch time: ([\d.]+) s', line)
            if t and epochs:
                epochs[-1]['epoch_time_s'] = float(t.group(1))
    return epochs


def parse_compiles(log_path):
    """Summarize JAX_LOG_COMPILES events: per-executable count and
    total/max seconds (the compile-weather evidence)."""
    if not os.path.exists(log_path):
        return None
    pat = re.compile(
        r'Finished XLA compilation of jit\(([A-Za-z_0-9]+)\) '
        r'in ([0-9.]+) sec')
    seen = set()
    by_name = {}
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            key = (m.group(1), m.group(2))
            if key in seen:      # every event is logged twice
                continue
            seen.add(key)
            name, sec = m.group(1), float(m.group(2))
            entry = by_name.setdefault(
                name, {'count': 0, 'total_s': 0.0, 'max_s': 0.0})
            entry['count'] += 1
            entry['total_s'] = round(entry['total_s'] + sec, 1)
            entry['max_s'] = round(max(entry['max_s'], sec), 1)
    return by_name or None


def main():
    model_dir, test_dset = sys.argv[1], sys.argv[2]
    out_name = sys.argv[3] if len(sys.argv) > 3 else 'r5_e2e_digest.json'
    epochs = parse_train_log(model_dir)

    losses = np.load(os.path.join(model_dir, 'losses.npz'),
                     allow_pickle=True)
    train_curve = np.asarray(losses['train'], dtype=float).tolist()

    # pure-train epochs (no validation) give the clean in-loop rate
    times = [e['epoch_time_s'] for e in epochs
             if 'epoch_time_s' in e and 'val_loss' not in e]
    summary = {
        'model_dir': model_dir,
        'epochs_ran': len(epochs),
        'train_loss_first': train_curve[0] if train_curve else None,
        'train_loss_last': train_curve[-1] if train_curve else None,
        'train_curve': train_curve,
        'epoch_time_s_median_noval': float(np.median(times))
        if times else None,
        'epoch_time_s_min': float(np.min(times)) if times else None,
        'compiles': parse_compiles(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            os.path.basename(out_name).replace('_digest.json', '.log')
            if out_name.endswith('_digest.json') else 'r5_e2e.log')),
    }

    score_file = os.path.join(model_dir, 'scores.hdf5')
    if os.path.exists(score_file):
        import h5py
        with h5py.File(score_file, 'r') as h5:
            metrics = [m.decode() if isinstance(m, bytes) else m
                       for m in h5['metrics'][...]]
            scores_by_test = {}
            for ckpt in h5:
                if ckpt in ('metrics', 'which'):
                    continue
                for test in h5[ckpt]:
                    scores_by_test[f'{ckpt}/{test}'] = h5[ckpt][test][...]
            for key, scores in scores_by_test.items():
                entry = {}
                for i, m in enumerate(metrics):
                    entry[m] = {
                        'input': float(scores[:, i, 0].mean()),
                        'output': float(scores[:, i, 1].mean()),
                        'delta': float(
                            (scores[:, i, 1] - scores[:, i, 0]).mean()),
                    }
                summary.setdefault('test_scores', {})[key] = entry

    print(json.dumps(summary, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.path.basename(out_name))
    with open(out, 'w') as f:
        json.dump(summary, f, indent=1)


if __name__ == '__main__':
    main()
