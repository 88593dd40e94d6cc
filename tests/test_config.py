"""Config spine contracts: hash invariance, immutability, typed
set_field, arg-map coverage (reference tests/test_config.py,
test_args.py)."""

import numpy as np
import pytest

from brever_tpu.config import BreverConfig
from brever_tpu.inspect import Bool, Path, get_func_spec
from brever_tpu.utils import pretty_table


def test_hash_invariant_to_dict_order():
    a = BreverConfig({'x': 1, 'nested': {'a': 2, 'b': 3}})
    b = BreverConfig({'nested': {'b': 3, 'a': 2}, 'x': 1})
    assert a.get_hash() == b.get_hash()


def test_hash_invariant_to_set_order():
    a = BreverConfig({'s': {'x', 'y', 'z'}})
    b = BreverConfig({'s': {'z', 'y', 'x'}})
    assert a.get_hash() == b.get_hash()


def test_hash_changes_with_content():
    a = BreverConfig({'x': 1})
    b = BreverConfig({'x': 2})
    assert a.get_hash() != b.get_hash()
    assert len(a.get_hash()) == 8


def test_immutability():
    cfg = BreverConfig({'x': 1, 'nested': {'a': 2}})
    with pytest.raises(AttributeError):
        cfg.x = 3
    with pytest.raises(AttributeError):
        cfg.nested.a = 3


def test_set_field_typed():
    cfg = BreverConfig({'x': 1, 'nested': {'a': 2.0}})
    cfg.set_field(['x'], 5)
    assert cfg.x == 5
    cfg.set_field(['nested', 'a'], 3.0)
    assert cfg.nested.a == 3.0
    with pytest.raises(TypeError):
        cfg.set_field(['x'], 'oops')


def test_get_field():
    cfg = BreverConfig({'a': {'b': {'c': 42}}})
    assert cfg.get_field(['a', 'b', 'c']) == 42


def test_update_from_dict():
    cfg = BreverConfig({'a': {'b': 1}, 'c': 2})
    cfg.update_from_dict({'a': {'b': 7}})
    assert cfg.a.b == 7 and cfg.c == 2


def test_to_json_sorts_sets():
    cfg = BreverConfig({'s': {'b', 'a'}})
    assert cfg.to_json() == {'s': ['a', 'b']}


# ----------------------------------------------------------------------
# introspection


def test_get_func_spec_scalars():
    def f(self, a: int = 1, b: float = 2.0, c: str = 'x', d: bool = False):
        pass

    spec = get_func_spec(f)
    assert spec['a']['type'] is int and spec['a']['default'] == 1
    assert spec['d']['type'] is Bool
    assert not spec['a']['required']


def test_get_func_spec_containers():
    def f(self, a: list[int] = [1], b: set[str] = {'x'},
          c: tuple[float, float] = (0.0, 1.0)):
        pass

    spec = get_func_spec(f)
    for key in 'abc':
        assert spec[key]['type'] is str
        assert spec[key]['action'] is not None
    action = spec['a']['action']('--a', dest='a')
    import argparse
    ns = argparse.Namespace()
    action(None, ns, '1,2,3')
    assert ns.a == [1, 2, 3]


def test_get_func_spec_noparse_and_unions():
    from brever_tpu.inspect import NoParse, Parse

    def f(self, a: NoParse[str] = 'hidden', b: int | Parse[str] = 'auto'):
        pass

    spec = get_func_spec(f)
    assert 'a' not in spec
    assert spec['b']['type'] is str


def test_get_func_spec_missing_hint():
    def f(self, a=1):
        pass

    with pytest.raises(ValueError, match='missing type hint'):
        get_func_spec(f)


def test_get_func_spec_bad_default():
    def f(self, a: int = 'x'):
        pass

    with pytest.raises(ValueError, match='does not match'):
        get_func_spec(f)


def test_arg_maps_cover_signatures():
    from brever_tpu.args import DatasetArgParser, ModelArgParser
    from brever_tpu.mixture import RandomMixtureMaker

    arg_map = DatasetArgParser.arg_map()
    spec = get_func_spec(RandomMixtureMaker)
    for arg in spec:
        assert arg in arg_map
        assert ['rmm', arg] in arg_map[arg]

    model_map = ModelArgParser.arg_map('ffnn')
    from brever_tpu.models import ModelRegistry
    for arg in get_func_spec(ModelRegistry.get('ffnn')):
        assert arg in model_map


def test_dataset_arg_parser_parses():
    from brever_tpu.args import DatasetArgParser
    parser = DatasetArgParser()
    args = parser.parse_args(
        ['--speakers', 'synth_.*', '--noise_num', '0,2', '--decay', 'yes',
         '--duration', '60'])
    assert args.speakers == {'synth_.*'}
    assert args.noise_num == (0, 2)
    assert args.decay is True
    assert args.duration == 60


def test_path_normalization():
    assert Path('a\\b\\c/') == 'a/b/c'


def test_pretty_table(capsys):
    pretty_table({'m1': {'loss': 0.5, 'pesq': 2.0},
                  'm2': {'loss': 0.3, 'pesq': 2.5}},
                 key_header='model', order_by='loss')
    out = capsys.readouterr().out
    assert 'model' in out and 'loss' in out
    # ordered by loss: m2 first
    assert out.index('m2') < out.index('m1')


def test_math_dict():
    from brever_tpu.utils import MathDict
    d = MathDict({'a': 1.0, 'b': 2.0})
    assert (d + d)['a'] == 2.0
    assert (d * 3)['b'] == 6.0
    assert (d / 2)['a'] == 0.5


def test_pad_util():
    from brever_tpu.utils import pad
    x = np.ones((2, 3))
    assert pad(x, 2, axis=0, where='left').shape == (4, 3)
    assert pad(x, 2, axis=1, where='both').shape == (2, 7)
    with pytest.raises(ValueError):
        pad(x, 1, where='middle')


def test_fft_freqs():
    from brever_tpu.utils import fft_freqs
    f = fft_freqs(16000, 512)
    assert len(f) == 257
    assert f[0] == 0 and f[-1] == 8000
    f2 = fft_freqs(16000, 512, onesided=False)
    assert len(f2) == 512
    assert f2[-1] < 0
