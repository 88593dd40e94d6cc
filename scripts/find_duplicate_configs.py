"""Group model directories whose configs hash identically.

A model directory's name is its config hash at init time; directories
drift out of sync when configs are hand-edited afterwards. Prints one
line of space-separated paths per duplicated config (reference
scripts/find_duplicate_configs.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.config import get_config  # noqa: E402


def main():
    argparse.ArgumentParser(description=__doc__).parse_args()
    models_dir = get_config('config/paths.yaml').MODELS
    if not os.path.isdir(models_dir):
        print(f'no models directory at {models_dir}')
        return

    cfgs = {}
    for model_id in os.listdir(models_dir):
        model_dir = os.path.join(models_dir, model_id)
        config_path = os.path.join(model_dir, 'config.yaml')
        if not os.path.exists(config_path):
            print(f'Model {model_id} has no config.yaml!')
            continue
        config = get_config(config_path)
        cfgs.setdefault(config.get_hash(), []).append(model_dir)

    for cfg_id, model_dirs in cfgs.items():
        if len(model_dirs) > 1:
            print(' '.join(model_dirs))


if __name__ == '__main__':
    main()
