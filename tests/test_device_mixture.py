"""On-device batched mixture synthesis: parity with the numpy path."""

import jax
import jax.numpy as jnp
import numpy as np

from brever_tpu.mixture import device as dev
from brever_tpu.mixture.dsp import (
    Mixture,
    spatialize as np_spatialize,
    split_brir as np_split_brir,
)


def test_fft_convolve_matches_scipy():
    import scipy.signal
    rng = np.random.RandomState(0)
    x = rng.randn(1000).astype('float32')
    k = rng.randn(64).astype('float32')
    got = np.asarray(dev.fft_convolve(jnp.asarray(x), jnp.asarray(k), 1000))
    want = scipy.signal.oaconvolve(x, k, mode='full')[:1000]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_device_spatialize_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(2000).astype('float32')
    brir = rng.randn(128, 2).astype('float32')
    got = np.asarray(dev.spatialize(jnp.asarray(x), jnp.asarray(brir)))
    want = np_spatialize(x, brir)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_device_split_brir_matches_numpy():
    rng = np.random.RandomState(2)
    fs = 16000
    brir = np.zeros((2000, 2), dtype='float32')
    brir[50, 0] = 1.0
    brir[55, 1] = 0.8
    brir[900:] = 0.1 * rng.randn(1100, 2)
    early_np, late_np = np_split_brir(brir, 0.05, fs)
    early_dev, late_dev = dev.split_brir(
        jnp.asarray(brir), 2000, 0.05, fs)
    np.testing.assert_allclose(np.asarray(early_dev), early_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(late_dev), late_np, atol=1e-6)


def test_device_colored_noise_psd():
    x = np.asarray(dev.colored_noise(jax.random.PRNGKey(0),
                                     jnp.asarray(1.0), 2**14))
    spec = np.abs(np.fft.rfft(x))**2
    f = np.fft.rfftfreq(2**14)
    lo = spec[(f > 0.001) & (f < 0.01)].mean()
    hi = spec[(f > 0.1) & (f < 0.5)].mean()
    assert lo > 5 * hi  # pink: more energy at low frequencies


def test_scene_parity_with_numpy_pipeline():
    """Device scene == numpy Mixture for identical inputs (no decay)."""
    rng = np.random.RandomState(3)
    fs = 16000
    n = 8000
    speech = rng.randn(n).astype('float32')
    brir = np.zeros((400, 2), dtype='float32')
    brir[10, 0] = 1.0
    brir[14, 1] = 0.9
    brir[200:300] = 0.05 * rng.randn(100, 2)
    noise = rng.randn(n).astype('float32')
    noise_brir = np.zeros((400, 2), dtype='float32')
    noise_brir[12, :] = 0.7
    snr = 3.0

    # numpy path
    mix = Mixture()
    mix.add_speech(x=speech, brir=brir, reflection_boundary=0.05,
                   padding=0.0, fs=fs)
    mix.add_noises([noise], [noise_brir])
    mix.set_snr(snr)
    mix.set_rms(mix.get_rms() + 0.0)

    # device path
    out = dev.synthesize_scene(
        jax.random.PRNGKey(0),
        jnp.asarray(speech), n,
        jnp.asarray(brir), 400,
        jnp.asarray(noise)[None], jnp.asarray(noise_brir)[None],
        jnp.asarray([400]), jnp.asarray([1.0]),
        jnp.asarray(snr), jnp.asarray(0.0),
        fs=fs,
    )
    np.testing.assert_allclose(
        np.asarray(out['foreground']), mix.foreground, rtol=1e-3,
        atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out['mixture']), mix.mixture, rtol=1e-3, atol=5e-3)


def test_synthesize_batch_jits_and_shapes():
    scenes = []
    rng = np.random.RandomState(4)
    for i in range(3):
        brir = np.zeros((64, 2), dtype='float32')
        brir[5, :] = 1.0
        scenes.append({
            'speech': rng.randn(4000 + 100 * i).astype('float32'),
            'target_brir': brir,
            'noises': [rng.randn(4000).astype('float32')],
            'noise_brirs': [brir],
            'snr': 5.0,
            'rms_jitter': 0.0,
            'decay': (0.2, 20.0, 0.01, 0.0),
        })
    # max_brir must cover the decay tail: 2*(rt60+delay)*fs = 6720
    packed = dev.pack_scenes(scenes, max_samples=4200, max_brir=8192,
                             max_noises=2)
    out = dev.synthesize_batch(
        jax.random.PRNGKey(0),
        **{k: jnp.asarray(v) for k, v in packed.items()},
        use_decay=True,
    )
    assert out['mixture'].shape == (3, 4200, 2)
    assert np.isfinite(np.asarray(out['mixture'])).all()
    # second call hits the jit cache (no exception, same shapes)
    out2 = dev.synthesize_batch(
        jax.random.PRNGKey(1),
        **{k: jnp.asarray(v) for k, v in packed.items()},
        use_decay=True,
    )
    assert not np.allclose(np.asarray(out['mixture']),
                           np.asarray(out2['mixture']))


def test_device_dynamic_mixing_loader(tmp_path):
    """Device dynamic mixing end-to-end through the dataloader."""
    import os
    import yaml
    from brever_tpu.batching import SortedBatchSampler
    from brever_tpu.data import BreverDataLoader, BreverDataset
    from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus

    corpus = tmp_path / 'corpus'
    make_synthetic_speech_corpus(str(corpus), n_speakers=2,
                                 files_per_speaker=2, seed=0)
    cfg_dir = tmp_path / 'config'
    os.makedirs(cfg_dir)
    with open(cfg_dir / 'paths.yaml', 'w') as f:
        yaml.dump({'SYNTH': str(corpus)}, f)

    dset_dir = tmp_path / 'dset'
    os.makedirs(dset_dir)
    rmm_cfg = dict(
        fs=16000, seed=0,
        speakers=['synth_.*'], noises=['colored_pink'],
        rooms=['synthetic_.*'], decay=True,
        decay_rt60_dist_args=[0.1, 0.2], noise_num=[1, 2],
    )
    with open(dset_dir / 'config.yaml', 'w') as f:
        yaml.dump({'rmm': rmm_cfg}, f)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        import brever_tpu.mixture.io as mio
        orig = mio.AudioFileLoader.__init__
        paths_file = str(cfg_dir / 'paths.yaml')

        def patched(self, fs=16e3, resample=True, _p=paths_file, **kw):
            orig(self, fs=fs, resample=resample, paths_file=_p)

        mio.AudioFileLoader.__init__ = patched
        try:
            ds = BreverDataset(
                path=str(dset_dir), dynamic_mixing=True,
                dynamic_mixtures_per_epoch=4,
                dynamic_mixing_device=True)
        finally:
            mio.AudioFileLoader.__init__ = orig
        sampler = SortedBatchSampler(ds, batch_size=2, shuffle=False)
        loader = BreverDataLoader(ds, sampler, pad_to_multiple=4000)
        total = 0
        for batch, lengths in loader:
            assert batch.ndim == 4 and batch.shape[1] == 2
            assert batch.shape[2] == 2  # binaural
            assert np.isfinite(batch).all()
            # mixture = components must be non-trivial
            assert np.abs(batch).max() > 0
            total += batch.shape[0]
        assert total == 4
    finally:
        os.chdir(cwd)


def test_device_mixing_pads_ragged_batches(tmp_path):
    """Ragged sampler remainders are padded to the nominal batch size
    so the synth graph keeps ONE compile signature (the first e2e TPU
    run paid 43 synthesize_batch compiles / 740 s to bucket-sampler
    remainders); lengths cover only the real rows."""
    import os
    import yaml
    from brever_tpu.batching import SortedBatchSampler
    from brever_tpu.data import BreverDataLoader, BreverDataset
    from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus

    corpus = tmp_path / 'corpus'
    make_synthetic_speech_corpus(str(corpus), n_speakers=2,
                                 files_per_speaker=2, seed=0)
    cfg_dir = tmp_path / 'config'
    os.makedirs(cfg_dir)
    with open(cfg_dir / 'paths.yaml', 'w') as f:
        yaml.dump({'SYNTH': str(corpus)}, f)
    dset_dir = tmp_path / 'dset'
    os.makedirs(dset_dir)
    rmm_cfg = dict(
        fs=16000, seed=0,
        speakers=['synth_.*'], noises=['colored_pink'],
        rooms=['synthetic_.*'], decay=True,
        decay_rt60_dist_args=[0.1, 0.2], noise_num=[1, 2],
    )
    with open(dset_dir / 'config.yaml', 'w') as f:
        yaml.dump({'rmm': rmm_cfg}, f)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        import brever_tpu.mixture.io as mio
        orig = mio.AudioFileLoader.__init__
        paths_file = str(cfg_dir / 'paths.yaml')

        def patched(self, fs=16e3, resample=True, _p=paths_file, **kw):
            orig(self, fs=fs, resample=resample, paths_file=_p)

        mio.AudioFileLoader.__init__ = patched
        try:
            ds = BreverDataset(
                path=str(dset_dir), dynamic_mixing=True,
                dynamic_mixtures_per_epoch=5,
                dynamic_mixing_device=True)
        finally:
            mio.AudioFileLoader.__init__ = orig
        # BRIR cap pre-warmed from the decay config bounds at init
        fs = 16000
        taps = int(round(2 * (0.2 + 0.1) * fs))
        assert ds.rmm_dset._brir_cap >= -(-taps // 4096) * 4096
        sampler = SortedBatchSampler(ds, batch_size=2, shuffle=False)
        loader = BreverDataLoader(ds, sampler, pad_to_multiple=4000)
        shapes, real_rows = [], []
        for batch, lengths in loader:
            shapes.append(tuple(np.asarray(batch).shape))
            # rows == len(lengths) invariant; pad rows have length 0
            assert np.asarray(batch).shape[0] == len(lengths)
            real_rows.append(int((np.asarray(lengths) > 0).sum()))
            assert np.isfinite(np.asarray(batch)).all()
        # 5 scenes / batch 2 -> 2 full + 1 remainder, all padded to 2
        assert [s[0] for s in shapes] == [2, 2, 2]
        assert real_rows == [2, 2, 1]
        # one synth signature for the whole epoch
        assert len(set(shapes)) == 1
    finally:
        os.chdir(cwd)


def _simple_scene_args(rng, n=8000, k_diffuse=3):
    speech = rng.randn(n).astype('float32')
    brir = np.zeros((400, 2), dtype='float32')
    brir[10, 0] = 1.0
    brir[14, 1] = 0.9
    brir[200:300] = 0.05 * rng.randn(100, 2)
    noise = rng.randn(n).astype('float32')
    noise_brir = np.zeros((400, 2), dtype='float32')
    noise_brir[12, :] = 0.7
    diffuse_brirs = np.zeros((k_diffuse, 400, 2), dtype='float32')
    for j in range(k_diffuse):
        diffuse_brirs[j, 8 + j, :] = 0.5
    return speech, brir, noise, noise_brir, diffuse_brirs


def test_scene_snr_parity_with_numpy_large_late_field():
    """The device SNR stage uses the exact reference formula (gain from
    fg/bg ratio applied to noise only) — checked against the numpy path
    with a *large* late field, where approximations would diverge."""
    rng = np.random.RandomState(7)
    fs, n = 16000, 8000
    speech = rng.randn(n).astype('float32')
    brir = np.zeros((2000, 2), dtype='float32')
    brir[10, 0] = 1.0
    brir[13, 1] = 0.9
    brir[850:2000] = 0.3 * rng.randn(1150, 2)  # strong reverb tail
    noise = rng.randn(n).astype('float32')
    noise_brir = np.zeros((2000, 2), dtype='float32')
    noise_brir[12, :] = 0.7
    snr = -3.0

    mix = Mixture()
    mix.add_speech(x=speech, brir=brir, reflection_boundary=0.05,
                   padding=0.0, fs=fs)
    mix.add_noises([noise], [noise_brir])
    mix.set_snr(snr)
    mix.set_rms(mix.get_rms() + 0.0)

    out = dev.synthesize_scene(
        jax.random.PRNGKey(0),
        jnp.asarray(speech), n,
        jnp.asarray(brir), 2000,
        jnp.asarray(noise)[None], jnp.asarray(noise_brir)[None],
        jnp.asarray([2000]), jnp.asarray([1.0]),
        jnp.asarray(snr), jnp.asarray(0.0),
        fs=fs,
    )
    np.testing.assert_allclose(
        np.asarray(out['mixture']), mix.mixture, rtol=1e-3, atol=5e-3)


def test_scene_diffuse_ndr_tmr():
    """Diffuse field + ndr + tmr gain contracts on device."""
    rng = np.random.RandomState(8)
    n = 8000
    speech, brir, noise, noise_brir, diffuse_brirs = _simple_scene_args(
        rng, n)
    ndr, tmr = 6.0, 0.35

    def scene(**kw):
        return dev.synthesize_scene(
            jax.random.PRNGKey(0),
            jnp.asarray(speech), n,
            jnp.asarray(brir), 400,
            jnp.asarray(noise)[None], jnp.asarray(noise_brir)[None],
            jnp.asarray([400]), jnp.asarray([1.0]),
            jnp.asarray(0.0), jnp.asarray(0.0),
            fs=16000,
            diffuse_brirs=jnp.asarray(diffuse_brirs),
            diffuse_brir_lengths=jnp.asarray([400] * 3),
            diffuse_mask=jnp.asarray([1.0, 1.0, 1.0]),
            diffuse_color_alpha=jnp.asarray(0.0),
            **kw,
        )

    # ndr: after the stage, dir/diffuse energy ratio == ndr. Verify via
    # the difference: noise - dir must be the scaled diffuse field.
    out_ndr = scene(ndr=jnp.asarray(ndr), use_snr=False)
    out_plain = scene(use_snr=False)
    assert not np.allclose(np.asarray(out_ndr['noise']),
                           np.asarray(out_plain['noise']))

    # tmr: fg/(fg+bg) == tmr over the full signal (channel-mean energy)
    out_tmr = scene(tmr=jnp.asarray(tmr), use_snr=False)
    e_fg = np.sum(np.asarray(out_tmr['foreground']).mean(-1)**2)
    e_bg = np.sum(np.asarray(out_tmr['background']).mean(-1)**2)
    np.testing.assert_allclose(e_fg / (e_fg + e_bg), tmr, rtol=1e-3)


def test_scene_ndr_energy_ratio():
    """After ndr, the dir/diffuse channel-mean energy ratio equals ndr
    (computed by rebuilding the diffuse field from component algebra:
    noise = dir + diffuse and speech/foreground are unaffected)."""
    rng = np.random.RandomState(9)
    n = 8000
    speech, brir, noise, noise_brir, diffuse_brirs = _simple_scene_args(
        rng, n)
    ndr = 6.0

    common = dict(
        fs=16000,
        diffuse_brirs=jnp.asarray(diffuse_brirs),
        diffuse_brir_lengths=jnp.asarray([400] * 3),
        diffuse_mask=jnp.asarray([1.0, 1.0, 1.0]),
        diffuse_color_alpha=jnp.asarray(0.0),
        use_snr=False,
    )
    args = (
        jax.random.PRNGKey(0),
        jnp.asarray(speech), n,
        jnp.asarray(brir), 400,
        jnp.asarray(noise)[None], jnp.asarray(noise_brir)[None],
        jnp.asarray([400]), jnp.asarray([1.0]),
        jnp.asarray(0.0), jnp.asarray(0.0),
    )
    # isolate the directional component: same key, diffuse masked out
    out_dir_only = dev.synthesize_scene(
        *args, **{**common, 'diffuse_mask': jnp.asarray([0.0] * 3)})
    out = dev.synthesize_scene(*args, ndr=jnp.asarray(ndr), **common)
    dir_noise = np.asarray(out_dir_only['noise'])
    diffuse = np.asarray(out['noise']) - dir_noise
    e_dir = np.sum(dir_noise.mean(-1)**2)
    e_diff = np.sum(diffuse.mean(-1)**2)
    np.testing.assert_allclose(10 * np.log10(e_dir / e_diff), ndr,
                               atol=0.05)


def test_device_match_ltas():
    """LTAS EQ pulls the long-term spectrum onto the target."""
    rng = np.random.RandomState(10)
    x = rng.randn(16000, 2).astype('float32')
    freqs = np.fft.rfftfreq(512)
    target = (1.0 / (1.0 + (freqs * 40)**2)).astype('float32') * 10
    y = np.asarray(dev.match_ltas(jnp.asarray(x), jnp.asarray(target)))
    assert y.shape == x.shape
    # measure the LTAS of the output with the same framing
    from brever_tpu.mixture.dsp import match_ltas as np_match_ltas
    y_np = np_match_ltas(x.astype('float64'), target.astype('float64'))
    # compare long-term spectra of device vs numpy EQ results
    import scipy.signal
    def ltas_of(sig):
        _, _, spec = scipy.signal.stft(sig, nperseg=512, noverlap=256,
                                       axis=0)
        return np.mean(np.abs(spec)**2, axis=(1, 2))
    got = ltas_of(y)
    want = ltas_of(y_np)
    band = slice(3, 200)  # ignore DC/edge bins
    np.testing.assert_allclose(
        10 * np.log10(got[band]), 10 * np.log10(want[band]), atol=1.5)


def test_device_loader_full_scene_family(tmp_path):
    """Loader path with diffuse + ndr + ltas + uniform_tmr + decay: the
    previously-gated scene flags now synthesize on device, and the
    batch STAYS on device (a jax.Array, no host round trip)."""
    import os
    import yaml
    from brever_tpu.batching import SortedBatchSampler
    from brever_tpu.data import BreverDataLoader, BreverDataset
    from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus

    corpus = tmp_path / 'corpus'
    make_synthetic_speech_corpus(str(corpus), n_speakers=2,
                                 files_per_speaker=2, seed=0)
    cfg_dir = tmp_path / 'config'
    os.makedirs(cfg_dir)
    with open(cfg_dir / 'paths.yaml', 'w') as f:
        yaml.dump({'SYNTH': str(corpus)}, f)

    dset_dir = tmp_path / 'dset'
    os.makedirs(dset_dir)
    rmm_cfg = dict(
        fs=16000, seed=0,
        speakers=['synth_.*'], noises=['colored_pink'],
        rooms=['synthetic_.*'], decay=True,
        decay_rt60_dist_args=[0.1, 0.2], noise_num=[1, 2],
        diffuse=True, diffuse_color='pink', diffuse_ltas_eq=True,
        uniform_tmr=True,
    )
    with open(dset_dir / 'config.yaml', 'w') as f:
        yaml.dump({'rmm': rmm_cfg}, f)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        import brever_tpu.mixture.io as mio
        orig = mio.AudioFileLoader.__init__
        paths_file = str(cfg_dir / 'paths.yaml')

        def patched(self, fs=16e3, resample=True, _p=paths_file, **kw):
            orig(self, fs=fs, resample=resample, paths_file=_p)

        mio.AudioFileLoader.__init__ = patched
        try:
            ds = BreverDataset(
                path=str(dset_dir), dynamic_mixing=True,
                dynamic_mixtures_per_epoch=4,
                dynamic_mixing_device=True)
        finally:
            mio.AudioFileLoader.__init__ = orig
        sampler = SortedBatchSampler(ds, batch_size=2, shuffle=False)
        loader = BreverDataLoader(ds, sampler, pad_to_multiple=4000)
        total = 0
        for batch, lengths in loader:
            assert isinstance(batch, jax.Array)  # stays on device
            assert batch.ndim == 4 and batch.shape[1] == 2
            assert np.isfinite(np.asarray(batch)).all()
            assert np.abs(np.asarray(batch)).max() > 0
            total += batch.shape[0]
        assert total == 4
    finally:
        os.chdir(cwd)
