"""Verify experiment directory names match their config hashes
(reference scripts/check_sanity.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.config import get_config  # noqa: E402


def check_dir(root):
    ok, bad = 0, 0
    if not os.path.exists(root):
        return ok, bad
    for name in os.listdir(root):
        cfg_path = os.path.join(root, name, 'config.yaml')
        if not os.path.exists(cfg_path):
            continue
        cfg = get_config(cfg_path)
        if cfg.get_hash() == name:
            ok += 1
        else:
            bad += 1
            print(f'hash mismatch: {os.path.join(root, name)} '
                  f'(config hashes to {cfg.get_hash()})')
    return ok, bad


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config-dir', default='config')
    args = parser.parse_args()

    paths = get_config(os.path.join(args.config_dir, 'paths.yaml'))
    total_ok, total_bad = 0, 0
    roots = [paths.MODELS] + [
        os.path.join(paths.DATASETS, kind)
        for kind in ('train', 'val', 'test')
    ]
    for root in roots:
        ok, bad = check_dir(root)
        total_ok += ok
        total_bad += bad
    print(f'{total_ok} directories OK, {total_bad} mismatches')
    sys.exit(1 if total_bad else 0)


if __name__ == '__main__':
    main()
