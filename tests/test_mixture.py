"""Mixture simulator tests: DSP primitives, randomizer determinism,
metadata reproducibility, end-to-end synthesis with synthetic material
(reference tests/test_randomizers.py, test_metadata.py patterns)."""

import os

import numpy as np
import pytest
import yaml

from brever_tpu.mixture.dsp import (
    BRIRDecay,
    Mixture,
    adjust_rms,
    adjust_snr,
    colored_noise,
    rms,
    spatialize,
    split_brir,
)
from brever_tpu.mixture.rand import (
    BaseRandGen,
    ChoiceRandGen,
    DistRandGen,
    MultiChoiceRandGen,
    Seeder,
)


def test_rms():
    x = np.array([1.0, -1.0, 1.0, -1.0])
    assert rms(x) == 1.0


def test_spatialize_identity():
    x = np.random.RandomState(0).randn(1000)
    brir = np.zeros((10, 2))
    brir[0, 0] = 1.0
    brir[3, 1] = 0.5
    out = spatialize(x, brir)
    assert out.shape == (1000, 2)
    np.testing.assert_allclose(out[:, 0], x, atol=1e-12)
    np.testing.assert_allclose(out[3:, 1], 0.5 * x[:-3], atol=1e-12)


@pytest.mark.parametrize('color,slope_sign', [
    ('brown', -1), ('pink', -1), ('white', 0), ('blue', 1), ('violet', 1),
])
def test_colored_noise_psd_slope(color, slope_sign):
    x = colored_noise(color, 2**16, seed=0)
    spec = np.abs(np.fft.rfft(x))**2
    f = np.fft.rfftfreq(2**16)
    lo = spec[(f > 0.001) & (f < 0.01)].mean()
    hi = spec[(f > 0.1) & (f < 0.5)].mean()
    if slope_sign < 0:
        assert lo > 10 * hi
    elif slope_sign > 0:
        assert hi > 10 * lo
    else:
        assert 0.2 < lo / hi < 5


def test_colored_noise_deterministic():
    a = colored_noise('pink', 1000, seed=3)
    b = colored_noise('pink', 1000, seed=3)
    np.testing.assert_array_equal(a, b)


def test_adjust_snr():
    rng = np.random.RandomState(0)
    signal = rng.randn(8000, 2)
    noise = rng.randn(8000, 2)
    for target in (-5, 0, 10):
        scaled, gain = adjust_snr(signal, noise, target)
        e_s = np.sum(signal.mean(axis=1)**2)
        e_n = np.sum(scaled.mean(axis=1)**2)
        got = 10 * np.log10(e_s / e_n)
        assert abs(got - target) < 1e-6


def test_adjust_rms():
    x = np.random.RandomState(0).randn(4000, 2)
    scaled, gain = adjust_rms(x, -20)
    assert abs(20 * np.log10(rms(scaled).max()) + 20) < 1e-6


def test_split_brir():
    fs = 16000
    brir = np.zeros((fs, 2))
    brir[100, 0] = 1.0
    brir[105, 1] = 0.9
    brir[5000, :] = 0.3  # late reflection
    early, late = split_brir(brir, reflection_boundary=0.05, fs=fs)
    np.testing.assert_array_equal(early + late, brir)
    assert early[100, 0] == 1.0 and early[105, 1] == 0.9
    assert late[5000, 0] == 0.3
    assert early[5000, 0] == 0.0


def test_brir_decay():
    fs = 16000
    brir = np.zeros((100, 2))
    brir[10, :] = 1.0
    decay = BRIRDecay(rt60=0.3, drr=10.0, delay=0.01, color='white', fs=fs)
    out = decay(brir, seed=0)
    assert len(out) == round(2 * (0.3 + 0.01) * fs)
    # direct-to-reverberant ratio target
    e_direct = np.sum(out[:len(brir)].mean(axis=1)**2)
    # tail added beyond the original support
    assert np.abs(out[len(brir):]).max() > 0
    assert decay(brir, seed=0).shape == out.shape
    np.testing.assert_array_equal(decay(brir, seed=0), out)
    # rt60 == 0 is a no-op
    noop = BRIRDecay(0, 10, 0.01, 'white', fs)
    np.testing.assert_array_equal(noop(brir), brir)
    assert e_direct > 0


def test_mixture_algebra():
    mix = Mixture()
    brir = np.zeros((2, 2))
    brir[0] = 1.0
    x = np.random.RandomState(0).randn(4000)
    mix.add_speech(x=x, brir=brir, reflection_boundary=0.05, padding=0.0,
                   fs=16000)
    noise = np.random.RandomState(1).randn(len(mix))
    mix.add_noises([noise], [brir])
    np.testing.assert_allclose(
        mix.mixture, mix.speech + mix.noise, atol=1e-12)
    np.testing.assert_allclose(mix.foreground, mix.early_speech)
    mix.set_snr(5.0)
    e_fg = np.sum(mix.foreground[slice(*mix.speech_idx)].mean(axis=1)**2)
    e_bg = np.sum(mix.background[slice(*mix.speech_idx)].mean(axis=1)**2)
    assert abs(10 * np.log10(e_fg / e_bg) - 5.0) < 1e-6
    mix.set_rms(-20)
    assert abs(mix.get_rms() + 20) < 1e-6


# ----------------------------------------------------------------------
# randomizers


def test_roll_get_protocol():
    gen = BaseRandGen(seed=0)
    with pytest.raises(ValueError):
        gen.get()
    gen.roll()
    gen.get()
    with pytest.raises(ValueError):
        gen.get()


def test_same_seed_same_sequence():
    draws = []
    for _ in range(2):
        gen = ChoiceRandGen(pool=[1, 2, 3, 4, 5], size=3, seed=11,
                            squeeze=False)
        seq = []
        for _ in range(10):
            gen.roll()
            seq.append(tuple(gen.get()))
        draws.append(seq)
    assert draws[0] == draws[1]


def test_size_extension_stability():
    """Increasing the draw size must not change earlier positions."""
    seqs = {}
    for size in (2, 4):
        gen = ChoiceRandGen(pool=list(range(10)), size=size, seed=5,
                            squeeze=False)
        seq = []
        for _ in range(5):
            gen.roll()
            seq.append(tuple(gen.get()))
        seqs[size] = seq
    for small, big in zip(seqs[2], seqs[4]):
        assert big[:2] == small


def test_multi_choice_sorted_key_determinism():
    """Insertion order of the pool dict must not affect draws."""
    pools_a = {'b': [1, 2, 3], 'a': [4, 5, 6]}
    pools_b = {'a': [4, 5, 6], 'b': [1, 2, 3]}
    out = []
    for pools in (pools_a, pools_b):
        gen = MultiChoiceRandGen(pools, seed=3)
        gen.roll()
        out.append((gen._pending['a'], gen._pending['b']))
    assert out[0] == out[1]


def test_dist_rand_gen():
    gen = DistRandGen('uniform', (0.0, 1.0), seed=0)
    gen.roll()
    v = gen.get()
    assert 0 <= v <= 1


def test_seeder_deterministic():
    a = Seeder(0)
    b = Seeder(0)
    assert [a() for _ in range(5)] == [b() for _ in range(5)]


# ----------------------------------------------------------------------
# end-to-end with synthetic material


@pytest.fixture(scope='module')
def synth_env(tmp_path_factory):
    """Synthetic speech corpus + paths.yaml pointing at it."""
    from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus
    root = tmp_path_factory.mktemp('synth_env')
    corpus = root / 'corpus'
    make_synthetic_speech_corpus(str(corpus), n_speakers=2,
                                 files_per_speaker=3, seed=0)
    config_dir = root / 'config'
    os.makedirs(config_dir)
    with open(config_dir / 'paths.yaml', 'w') as f:
        yaml.dump({'SYNTH': str(corpus), 'MODELS': str(root / 'models'),
                   'DATASETS': str(root / 'datasets')}, f)
    return root


def _make_rmm(synth_env, **kwargs):
    from brever_tpu.mixture import RandomMixtureMaker
    defaults = dict(
        speakers={'synth_.*'},
        noises={'colored_pink'},
        rooms={'synthetic_.*'},
        decay=True,
        decay_rt60_dist_args=(0.1, 0.3),
        seed=0,
    )
    defaults.update(kwargs)
    import brever_tpu.mixture.io as mio
    maker_cls = RandomMixtureMaker
    # point the loader at the test paths.yaml
    orig = mio.AudioFileLoader.__init__
    paths_file = str(synth_env / 'config' / 'paths.yaml')

    def patched(self, fs=16e3, resample=True, _paths=paths_file, **kw):
        orig(self, fs=fs, resample=resample, paths_file=_paths)

    mio.AudioFileLoader.__init__ = patched
    try:
        return maker_cls(**defaults)
    finally:
        mio.AudioFileLoader.__init__ = orig


def test_rmm_end_to_end(synth_env):
    rmm = _make_rmm(synth_env)
    mix, metadata = rmm()
    assert mix.mixture.ndim == 2 and mix.mixture.shape[1] == 2
    assert metadata['room'].startswith('synthetic_')
    assert 'snr' in metadata
    assert metadata['frames'] == len(mix)
    assert np.isfinite(mix.mixture).all()


def test_rmm_metadata_reproducible(synth_env):
    metas = []
    for _ in range(2):
        rmm = _make_rmm(synth_env, seed=123)
        rmm.metadata.roll()
        metas.append(rmm.metadata.get())
    assert metas[0] == metas[1]


def test_rmm_make_from_metadata_reproducible(synth_env):
    # without unseeded noise draws the whole mixture is deterministic
    # given the metadata (decay tail uses the stored seed)
    rmm = _make_rmm(synth_env, seed=9, noise_num=(0, 1))
    meta = None
    while meta is None or 'noises' in meta:
        mix1, meta = rmm()
    mix2 = rmm.make_from_metadata(meta)
    np.testing.assert_array_equal(mix1.mixture, mix2.mixture)
