"""Immutable nested configs with content-addressed experiment dirs.

The distinguishing UX of the reference framework, kept intact
(reference brever/config.py:13-352):

* ``BreverConfig`` — immutable attribute-style nested config built from
  YAML; typed ``set_field``; deterministic 8-hex-char SHA-256 hash of
  the sorted nested dict, used as the experiment directory name.
* ``ModelInitializer``/``DatasetInitializer`` — write hashed config
  dirs under the paths.yaml MODELS/DATASETS roots.
* ``ModelFinder``/``DatasetFinder`` — query existing experiment dirs by
  CLI-style filters.

Default YAML schemas are generated from (and warn-checked against) the
``__init__`` signatures of RandomMixtureMaker and the model classes.
"""

import hashlib
import os
import warnings

import yaml

from .args import DatasetArgParser, ModelArgParser
from .inspect import Path, get_func_spec


def get_config(path):
    with open(path) as f:
        return BreverConfig(yaml.load(f, Loader=yaml.Loader))


def get_model_default_config(model_key, config_dir='config'):
    from .models import ModelRegistry
    path = f'{config_dir}/models/{model_key}.yaml'
    with open(path) as f:
        file_config = yaml.load(f, Loader=yaml.Loader)
    spec = get_func_spec(ModelRegistry.get(model_key))
    spec_config = {arg: item['default'] for arg, item in spec.items()}
    if file_config['model'] != spec_config:
        warnings.warn(f'Default config file {path} does not match default '
                      'arguments from model __init__ signature')
    return BreverConfig(file_config)


def get_dataset_default_config(config_dir='config'):
    from .mixture import RandomMixtureMaker
    path = f'{config_dir}/dataset.yaml'
    with open(path) as f:
        file_config = yaml.load(f, Loader=yaml.Loader)
    spec = get_func_spec(RandomMixtureMaker)
    spec_config = {arg: item['default'] for arg, item in spec.items()}
    if file_config['rmm'] != spec_config:
        warnings.warn(f'Default config file {path} does not match default '
                      'arguments from dataset __init__ signature')
    return BreverConfig(file_config)


class BreverConfig:
    """Immutable nested attribute config."""

    def __init__(self, dict_):
        for key, value in dict_.items():
            if isinstance(value, dict):
                value = BreverConfig(value)
            object.__setattr__(self, key, value)

    def __setattr__(self, attr, value):
        raise AttributeError(
            f'{type(self).__name__} objects are immutable')

    def to_dict(self):
        out = {}
        for key, value in self.__dict__.items():
            out[key] = value.to_dict() if isinstance(value, BreverConfig) \
                else value
        return out

    def to_json(self):
        out = {}
        for key, value in self.__dict__.items():
            if isinstance(value, BreverConfig):
                out[key] = value.to_json()
            elif isinstance(value, set):
                out[key] = sorted(value)
            else:
                out[key] = value
        return out

    def get_hash(self, length=8):
        """Deterministic content hash: SHA-256 of the sorted nested dict."""

        def normalize(d):
            out = {}
            for key in sorted(d):
                value = d[key]
                if isinstance(value, dict):
                    out[key] = normalize(value)
                elif isinstance(value, set):
                    out[key] = sorted(value)
                else:
                    out[key] = value
            return out

        canonical = str(normalize(self.to_dict()).items())
        return hashlib.sha256(canonical.encode()).hexdigest()[:length]

    def get_field(self, key_list):
        value = getattr(self, key_list[0])
        return value if len(key_list) == 1 else value.get_field(key_list[1:])

    def set_field(self, key_list, value):
        if len(key_list) > 1:
            self.get_field(key_list[:-1]).set_field(key_list[-1:], value)
            return
        key = key_list[0]
        current = getattr(self, key)
        if not isinstance(value, type(current)):
            raise TypeError(
                f'attribute {key} must be {type(current).__name__}, got '
                f'{type(value).__name__}')
        object.__setattr__(self, key, value)

    def update_from_args(self, args, arg_map):
        for arg_name, key_lists in arg_map.items():
            value = getattr(args, arg_name, None)
            if value is not None:
                for key_list in key_lists:
                    self.set_field(key_list, value)

    def update_from_dict(self, dict_):
        def flatten(d, prefix=()):
            for key, value in d.items():
                if isinstance(value, dict):
                    yield from flatten(value, prefix + (key,))
                else:
                    yield list(prefix + (key,)), value

        for key_list, value in flatten(dict_):
            self.set_field(key_list, value)


class _BaseFinder:
    """Scan experiment dirs and filter their configs by CLI-style args."""

    def _matches(self, config, arg_map, kwargs):
        for key, value in kwargs.items():
            for key_list in arg_map[key]:
                try:
                    if config.get_field(key_list) != value:
                        return False
                except AttributeError:
                    return False
        return True


class ModelFinder(_BaseFinder):

    def __init__(self):
        self.models = None

    def find(self, arch=None, **kwargs):
        if self.models is None:
            self.models = {}
            models_dir = get_config('config/paths.yaml').MODELS
            if os.path.exists(models_dir):
                for model in os.listdir(models_dir):
                    cfg_path = os.path.join(models_dir, model, 'config.yaml')
                    if os.path.exists(cfg_path):
                        self.models[os.path.join(models_dir, model)] = \
                            get_config(cfg_path)

        models, configs = [], []
        for model, cfg in self.models.items():
            if arch is not None and getattr(cfg, 'arch', None) != arch:
                continue
            if kwargs:
                if not hasattr(cfg, 'arch'):
                    continue
                arg_map = ModelArgParser.arg_map(cfg.arch)
                if not self._matches(cfg, arg_map, kwargs):
                    continue
            models.append(model)
            configs.append(cfg)
        return models, configs

    def find_from_args(self, args):
        if args.arch is None:
            arg_map = ModelArgParser.trainer_arg_map()
        else:
            arg_map = ModelArgParser.arg_map(args.arch)
        kwargs = {
            key: getattr(args, key) for key in arg_map
            if getattr(args, key) is not None
        }
        return self.find(args.arch, **kwargs)


class DatasetFinder(_BaseFinder):

    def __init__(self):
        self.dsets = None

    def find(self, kind=None, **kwargs):
        if self.dsets is None:
            self.dsets = {}
            datasets_dir = get_config('config/paths.yaml').DATASETS
            kinds = ['train', 'val', 'test'] if kind is None else [kind]
            for k in kinds:
                kind_dir = os.path.join(datasets_dir, k)
                if not os.path.exists(kind_dir):
                    continue
                for dset in os.listdir(kind_dir):
                    cfg_path = os.path.join(kind_dir, dset, 'config.yaml')
                    if os.path.exists(cfg_path):
                        self.dsets[os.path.join(kind_dir, dset)] = \
                            get_config(cfg_path)

        arg_map = DatasetArgParser.arg_map()
        dsets, configs = [], []
        for dset, cfg in self.dsets.items():
            if self._matches(cfg, arg_map, kwargs):
                dsets.append(dset)
                configs.append(cfg)
        return dsets, configs

    def find_from_args(self, args):
        arg_map = DatasetArgParser.arg_map()
        kwargs = {
            key: getattr(args, key) for key in arg_map
            if getattr(args, key) is not None
        }
        return self.find(args.kind, **kwargs)


class _BaseInitializer:

    def _write(self, target_dir, config, force, what):
        os.makedirs(target_dir, exist_ok=True)
        config_path = os.path.join(target_dir, 'config.yaml')
        if os.path.exists(config_path) and not force:
            msg = f'{what} already exists: {config_path}'
            if self.batch_mode:
                print(msg)
            else:
                raise FileExistsError(msg)
        else:
            with open(config_path, 'w') as f:
                yaml.dump(config.to_dict(), f)
            print(f'Initialized {config_path}')
        return Path(target_dir)


class ModelInitializer(_BaseInitializer):

    def __init__(self, batch_mode=False, config_dir='config'):
        self.dir_ = get_config(f'{config_dir}/paths.yaml').MODELS
        self.batch_mode = batch_mode
        self.config_dir = config_dir

    def _default_cfg_path(self, arch):
        return f'{self.config_dir}/models/{arch}.yaml'

    def init_from_args(self, args):
        config = get_config(self._default_cfg_path(args.arch))
        config.update_from_args(args, ModelArgParser.arg_map(args.arch))
        return self.write_config(config, args.force)

    def init_from_kwargs(self, arch, force=False, model_id=None, **kwargs):
        config = self.get_config_from_kwargs(arch, **kwargs)
        return self.write_config(config, force=force, model_id=model_id)

    def get_config_from_kwargs(self, arch, **kwargs):
        config = get_config(self._default_cfg_path(arch))
        arg_map = ModelArgParser.arg_map(arch)
        for key, value in kwargs.items():
            for key_list in arg_map[key]:
                config.set_field(key_list, value)
        return config

    def get_path_from_kwargs(self, arch, **kwargs):
        config = self.get_config_from_kwargs(arch, **kwargs)
        return Path(os.path.join(self.dir_, config.get_hash()))

    def write_config(self, config, force=False, model_id=None):
        if model_id is None:
            model_id = config.get_hash()
        return self._write(os.path.join(self.dir_, model_id), config, force,
                           'model')


class DatasetInitializer(_BaseInitializer):

    def __init__(self, batch_mode=False, config_dir='config'):
        self.dir_ = get_config(f'{config_dir}/paths.yaml').DATASETS
        self.batch_mode = batch_mode
        self._default_cfg_path = f'{config_dir}/dataset.yaml'

    def init_from_args(self, args):
        config = get_config(self._default_cfg_path)
        config.update_from_args(args, DatasetArgParser.arg_map())
        return self.write_config(args.kind, config, args.force)

    def init_from_kwargs(self, kind, force=False, **kwargs):
        config = self.get_config_from_kwargs(**kwargs)
        return self.write_config(kind, config, force=force)

    def get_config_from_kwargs(self, **kwargs):
        config = get_config(self._default_cfg_path)
        arg_map = DatasetArgParser.arg_map()
        for key, value in kwargs.items():
            for key_list in arg_map[key]:
                config.set_field(key_list, value)
        return config

    def get_path_from_kwargs(self, kind, **kwargs):
        config = self.get_config_from_kwargs(**kwargs)
        return Path(os.path.join(self.dir_, kind, config.get_hash()))

    def write_config(self, kind, config, force=False):
        target = os.path.join(self.dir_, kind, config.get_hash())
        return self._write(target, config, force, 'dataset')
