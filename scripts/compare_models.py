"""Compare tested models: pretty tables and bar plots from scores.hdf5.

Reference behavior: scripts/compare_models.py — per-metric mean
input/output/delta scores, training time and peak memory stats.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.checkpoint import load_checkpoint  # noqa: E402
from brever_tpu.utils import pretty_table  # noqa: E402


def gather_scores(model_dir, test_names=None, checkpoint='last.ckpt'):
    import h5py
    score_file = os.path.join(model_dir, 'scores.hdf5')
    if not os.path.exists(score_file):
        return None
    out = {}
    with h5py.File(score_file) as h5f:
        metrics = list(h5f['metrics'].asstr())
        if checkpoint not in h5f:
            return None
        group = h5f[checkpoint]
        for test_name in group:
            if test_names and test_name not in test_names:
                continue
            scores = group[test_name][:]
            out[test_name] = {
                metric: {
                    'input': scores[:, i, 0].mean(),
                    'output': scores[:, i, 1].mean(),
                    'delta': (scores[:, i, 1] - scores[:, i, 0]).mean(),
                }
                for i, metric in enumerate(metrics)
            }
    return out


def training_stats(model_dir):
    ckpt_path = os.path.join(model_dir, 'checkpoints', 'last.ckpt')
    if not os.path.exists(ckpt_path):
        return {}
    state = load_checkpoint(ckpt_path)
    import json
    timer = json.loads(state['timer']) if isinstance(state['timer'], str) \
        else state['timer']
    return {
        'epochs': int(state['epochs']),
        'train_time_h': round(
            float(timer.get('epoch_time_sum', 0)) / 3600, 2),
        'peak_mem_GB': round(
            float(state.get('max_memory_allocated', 0)) / 2**30, 2),
    }


def main():
    parser = argparse.ArgumentParser(description='compare models')
    parser.add_argument('inputs', nargs='+', help='model directories')
    parser.add_argument('--tests', nargs='*', help='test names to include')
    parser.add_argument('--metric', default=None,
                        help='order models by this metric delta')
    parser.add_argument('--plot', action='store_true',
                        help='write a bar plot per metric')
    args = parser.parse_args()

    rows = {}
    for model_dir in args.inputs:
        model_id = os.path.basename(os.path.normpath(model_dir))
        scores = gather_scores(model_dir, args.tests)
        stats = training_stats(model_dir)
        if scores is None:
            print(f'{model_dir}: no scores found')
            continue
        # average over test sets
        merged = {}
        for test_scores in scores.values():
            for metric, vals in test_scores.items():
                merged.setdefault(metric, []).append(vals['delta'])
        row = {f'd_{m}': round(float(np.mean(v)), 4)
               for m, v in merged.items()}
        row.update(stats)
        rows[model_id] = row

    if not rows:
        print('nothing to compare')
        return

    # homogenize columns
    all_keys = sorted({k for row in rows.values() for k in row})
    for row in rows.values():
        for key in all_keys:
            row.setdefault(key, '-')
    order_by = f'd_{args.metric}' if args.metric else None
    pretty_table(rows, key_header='model', order_by=order_by, reverse=True)

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        metrics = [k for k in all_keys if k.startswith('d_')]
        fig, axes = plt.subplots(1, len(metrics),
                                 figsize=(4 * len(metrics), 4))
        if len(metrics) == 1:
            axes = [axes]
        for ax, metric in zip(axes, metrics):
            names = list(rows)
            values = [rows[n][metric] if rows[n][metric] != '-' else 0
                      for n in names]
            ax.bar(range(len(names)), values)
            ax.set_xticks(range(len(names)))
            ax.set_xticklabels(names, rotation=45, ha='right')
            ax.set_title(metric)
        fig.tight_layout()
        fig.savefig('compare_models.png')
        print('wrote compare_models.png')


if __name__ == '__main__':
    main()
