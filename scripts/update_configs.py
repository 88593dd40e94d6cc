"""Migrate existing experiment config files to the current schema.

For every model/dataset config dir: load the YAML, overlay it on the
current default schema (dropping unknown fields interactively), rewrite
the file and rename the directory to the new hash
(reference scripts/update_configs.py role).
"""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.config import BreverConfig, get_config  # noqa: E402


def merge(defaults, existing, prefix='', interactive=True, dropped=None):
    out = {}
    for key, value in defaults.items():
        if key in existing and isinstance(value, dict) \
                and isinstance(existing[key], dict):
            out[key] = merge(value, existing[key], f'{prefix}{key}.',
                             interactive, dropped)
        elif key in existing:
            out[key] = existing[key]
        else:
            out[key] = value
    for key in existing:
        if key not in defaults and dropped is not None:
            dropped.append(f'{prefix}{key}')
    return out


def update_dir(dir_, default_cfg_fn, interactive):
    for name in sorted(os.listdir(dir_)):
        cfg_path = os.path.join(dir_, name, 'config.yaml')
        if not os.path.exists(cfg_path):
            continue
        with open(cfg_path) as f:
            existing = yaml.load(f, Loader=yaml.Loader)
        defaults = default_cfg_fn(existing)
        dropped = []
        merged = merge(defaults, existing, dropped=dropped)
        new_hash = BreverConfig(merged).get_hash()
        if dropped:
            print(f'{cfg_path}: dropping unknown fields {dropped}')
            if interactive and input('proceed? [y/N] ').lower() != 'y':
                continue
        if new_hash == name and merged == existing:
            continue
        with open(cfg_path, 'w') as f:
            yaml.dump(merged, f)
        if new_hash != name:
            new_dir = os.path.join(dir_, new_hash)
            print(f'renaming {os.path.join(dir_, name)} -> {new_dir}')
            os.rename(os.path.join(dir_, name), new_dir)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config-dir', default='config')
    parser.add_argument('--yes', action='store_true',
                        help='do not ask for confirmation')
    args = parser.parse_args()

    paths = get_config(os.path.join(args.config_dir, 'paths.yaml'))

    def model_defaults(existing):
        arch = existing.get('arch')
        path = os.path.join(args.config_dir, 'models', f'{arch}.yaml')
        with open(path) as f:
            return yaml.load(f, Loader=yaml.Loader)

    def dataset_defaults(existing):
        with open(os.path.join(args.config_dir, 'dataset.yaml')) as f:
            return yaml.load(f, Loader=yaml.Loader)

    if os.path.exists(paths.MODELS):
        update_dir(paths.MODELS, model_defaults, not args.yes)
    for kind in ('train', 'val', 'test'):
        kind_dir = os.path.join(paths.DATASETS, kind)
        if os.path.exists(kind_dir):
            update_dir(kind_dir, dataset_defaults, not args.yes)


if __name__ == '__main__':
    main()
