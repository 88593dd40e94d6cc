"""Full CLI round trips: every hyperparameter of every component must
be expressible (and parseable) on the command line, per architecture —
the reference pins the same contract (reference tests/test_args.py)."""

import pytest

from brever_tpu.args import DatasetArgParser, ModelArgParser
from brever_tpu.config import (get_dataset_default_config,
                               get_model_default_config)
from brever_tpu.data import BreverDataset
from brever_tpu.inspect import get_func_spec
from brever_tpu.mixture import RandomMixtureMaker
from brever_tpu.models import ModelRegistry
from brever_tpu.training import BreverTrainer


def _default_flags(func, command):
    """One ``--arg=<default>`` per signature entry of ``func``."""
    for arg, spec in get_func_spec(func).items():
        default = spec['default']
        if isinstance(default, (list, tuple, set)):
            value = ','.join(str(v) for v in default)
        else:
            value = str(default)
        command.append(f'--{arg}={value}')
    return command


def test_dataset_args_round_trip():
    parser = DatasetArgParser()
    # every mixture-maker hyperparameter has exactly one flag
    assert len(parser._actions) == len(parser.arg_map()) + 1  # + --help

    cmd = ['--duration=36000', '--sources=mixture,foreground']
    _default_flags(RandomMixtureMaker, cmd)
    args = parser.parse_args(cmd)
    assert all(v is not None for v in vars(args).values())

    config = get_dataset_default_config()
    config.update_from_args(args, parser.arg_map())


@pytest.mark.parametrize('arch', sorted(ModelRegistry.keys()))
def test_model_args_round_trip(arch):
    cmd = ['--seed=0', '--train_path=foo', '--val_path=bar']
    _default_flags(BreverDataset, cmd)
    _default_flags(BreverTrainer, cmd)
    cmd.append(arch)
    _default_flags(ModelRegistry.get(arch), cmd)

    parser = ModelArgParser()
    args = parser.parse_args(cmd)
    for arg, value in vars(args).items():
        assert value is not None, f'--{arg} not set'

    config = get_model_default_config(arch)
    config.update_from_args(args, {
        **ModelArgParser.trainer_arg_map(),
        'arch': [['arch']],
        **{arg: [['model', arg]]
           for arg in get_func_spec(ModelRegistry.get(arch))},
    })
