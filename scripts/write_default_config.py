"""Regenerate default config YAMLs from ``__init__`` signatures.

``config/dataset.yaml`` comes from RandomMixtureMaker; each
``config/models/<arch>.yaml`` from the model class plus the dataset and
trainer signatures (reference scripts/write_default_config.py role).
"""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.data import BreverDataset  # noqa: E402
from brever_tpu.inspect import get_func_spec  # noqa: E402
from brever_tpu.mixture import RandomMixtureMaker  # noqa: E402
from brever_tpu.models import ModelRegistry  # noqa: E402
from brever_tpu.training import BreverTrainer  # noqa: E402


# sets dump in hash order by default, churning the files on every
# regeneration; emit members sorted so regen is idempotent. The plain
# Dumper is kept (NOT SafeDumper) so tuple defaults round-trip as
# !!python/tuple like the reference's config files — SafeDumper would
# silently demote them to lists and break the config type contract.
yaml.Dumper.add_representer(
    set,
    lambda dumper, data: dumper.represent_mapping(
        'tag:yaml.org,2002:set', {k: None for k in sorted(data)}))


def spec_defaults(cls):
    return {arg: item['default']
            for arg, item in get_func_spec(cls).items()}


# Per-arch trainer overrides, mirroring the reference's shipped config
# files (which are generated then hand-edited): the heavy models train
# under amp (reference config/models/*.yaml:39 sets use_amp true for
# everything except ffnn and the MetricGAN family, whose GAN trainer
# path stays f32). On TPU, amp additionally gates the fused Pallas
# kernels (flash-TCN/flash-LSTM engage in bf16).
TRAINER_OVERRIDES = {
    arch: {'use_amp': True}
    for arch in ('convtasnet', 'dccrn', 'idmse', 'idmselarge', 'manner',
                 'sgmsep', 'sgmsepheun', 'sgmsepm', 'sgmsepmheun',
                 'tfgridnet')
}


def main(config_dir):
    os.makedirs(os.path.join(config_dir, 'models'), exist_ok=True)

    dataset_cfg = {
        'duration': 36000,
        'sources': ['mixture', 'foreground'],
        'rmm': spec_defaults(RandomMixtureMaker),
    }
    path = os.path.join(config_dir, 'dataset.yaml')
    with open(path, 'w') as f:
        yaml.dump(dataset_cfg, f, sort_keys=False)
    print(f'wrote {path}')

    dataset_defaults = spec_defaults(BreverDataset)
    trainer_defaults = spec_defaults(BreverTrainer)
    for arch in ModelRegistry.keys():
        model_cfg = {
            'arch': arch,
            'seed': 0,
            'train_path': 'none',
            'val_path': 'none',
            'dataset': dict(dataset_defaults),
            'trainer': {**trainer_defaults,
                        **TRAINER_OVERRIDES.get(arch, {})},
            'model': spec_defaults(ModelRegistry.get(arch)),
        }
        path = os.path.join(config_dir, 'models', f'{arch}.yaml')
        with open(path, 'w') as f:
            yaml.dump(model_cfg, f, sort_keys=False)
        print(f'wrote {path}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--config-dir', default='config')
    main(parser.parse_args().config_dir)
