"""Print statistics of created datasets: duration, segment counts,
per-source RMS (reference scripts/dataset_specs.py role)."""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.data import BreverDataset  # noqa: E402
from brever_tpu.utils import pretty_table  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('inputs', nargs='+', help='dataset directories')
    args = parser.parse_args()

    rows = {}
    for path in args.inputs:
        info_path = os.path.join(path, 'mixture_info.json')
        if not os.path.exists(info_path):
            print(f'{path}: not created')
            continue
        with open(info_path) as f:
            metas = json.load(f)
        dataset = BreverDataset(path=path)
        lengths = [dataset.get_segment_length(i)
                   for i in range(len(dataset))]
        rows[os.path.basename(os.path.normpath(path))] = {
            'mixtures': len(metas),
            'duration_s': round(sum(lengths) / dataset.fs, 1),
            'min_len_s': round(min(lengths) / dataset.fs, 2),
            'max_len_s': round(max(lengths) / dataset.fs, 2),
            'mean_len_s': round(float(np.mean(lengths)) / dataset.fs, 2),
        }
    if rows:
        pretty_table(rows, key_header='dataset')


if __name__ == '__main__':
    main()
