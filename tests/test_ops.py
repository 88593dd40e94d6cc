"""DSP substrate tests: STFT round trips, norms causality, features,
resampling — the numerical contracts pinned by the reference suite
(reference tests/test_modules.py)."""

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.ops import (
    STFT,
    ConvSTFT,
    FeatureExtractor,
    MelFilterbank,
    causal_group_norm,
    causal_instance_norm,
    causal_layer_norm,
    downsample_2d,
    upsample_2d,
)
from brever_tpu.ops.features import first_order_smooth
from brever_tpu.ops.stft import frame_signal, overlap_add


@pytest.mark.parametrize(
    'kwargs',
    [
        dict(zip(
            ['frame_length', 'hop_length', 'compression_factor',
             'scale_factor', 'normalized', 'onesided'],
            vals,
        ))
        for vals in itertools.product(
            [512], [256, 128], [1.0, 0.5], [1.0, 0.15],
            [False, True], [False, True],
        )
    ],
)
def test_stft_round_trip(kwargs):
    stft = STFT(**kwargs)
    x = jnp.asarray(np.random.RandomState(42).randn(4096).astype('float32'))
    y = stft.backward(stft(x))
    assert y.shape == x.shape
    np.testing.assert_allclose(x, y, rtol=0, atol=5e-5)
    np.testing.assert_allclose(x, y, rtol=2e-3, atol=1e-7)


def test_stft_batched_matches_unbatched():
    stft = STFT(frame_length=512, hop_length=256)
    x = np.random.RandomState(0).randn(3, 2, 4000).astype('float32')
    batched = stft(jnp.asarray(x))
    for i in range(3):
        for c in range(2):
            single = stft(jnp.asarray(x[i, c]))
            np.testing.assert_allclose(batched[i, c], single, atol=1e-5)


def test_stft_jit():
    stft = STFT(frame_length=512, hop_length=256)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4096).astype('float32'))
    fn = jax.jit(lambda x: stft.backward(stft(x)))
    np.testing.assert_allclose(fn(x), x, atol=1e-5)


@pytest.mark.parametrize(
    'kwargs',
    [
        dict(zip(
            ['frame_length', 'hop_length', 'compression_factor',
             'scale_factor', 'normalized'],
            vals,
        ))
        for vals in itertools.product(
            [512], [256, 128], [1.0, 0.5], [1.0, 0.15], [False, True],
        )
    ],
)
def test_conv_stft_round_trip(kwargs):
    stft = ConvSTFT(**kwargs)
    x = jnp.asarray(np.random.RandomState(42).randn(4096).astype('float32'))
    y = stft.backward(stft(x))
    np.testing.assert_allclose(x, y[..., :4096], rtol=1e-1, atol=1e-1)


def test_stft_matches_torch():
    """Cross-framework parity with the reference's torch.stft numerics."""
    torch = pytest.importorskip('torch')
    x_np = np.random.RandomState(7).randn(4096).astype('float32')
    frame_length, hop = 512, 256
    import scipy.signal
    window = scipy.signal.get_window('hann', frame_length).astype('float32')

    # reference forward: right-pad to integer frames, torch.stft center=True
    frames = int(np.ceil(max(4096 - frame_length, 0) / hop)) + 1
    padding = (frames - 1) * hop + frame_length - 4096
    xt = torch.nn.functional.pad(torch.from_numpy(x_np), (0, padding))
    ref = torch.stft(
        xt, n_fft=frame_length, hop_length=hop, win_length=frame_length,
        window=torch.from_numpy(window), center=True, pad_mode='constant',
        normalized=False, onesided=True, return_complex=True,
    ).numpy() / np.sqrt((window**2).sum())

    ours = np.asarray(STFT(frame_length, hop)(jnp.asarray(x_np)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_overlap_add_inverts_framing():
    x = np.random.RandomState(3).randn(2, 1024).astype('float32')
    frames = frame_signal(jnp.asarray(x), 256, 256)  # no overlap
    y = overlap_add(frames, 256, 1024)
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_mel_filterbank():
    fb = MelFilterbank(n_filters=64, n_fft=512)
    assert fb.filters.shape == (64, 257)
    # area-normalized rows sum to one
    np.testing.assert_allclose(fb.filters.sum(axis=1), 1.0, atol=1e-5)
    # pseudo-inverse roughly restores smooth spectra
    x = jnp.ones((257, 10))
    pooled = fb(x)
    restored = fb.backward(pooled)
    assert restored.shape == (257, 10)


def test_mel_matches_torch_reference_formula():
    fb = MelFilterbank(n_filters=16, n_fft=128, fs=16000, fmin=50, fmax=8000)
    # rebuild with float64 and compare
    mel_min = 2595 * np.log10(1 + 50 / 700)
    mel_max = 2595 * np.log10(1 + 8000 / 700)
    mel = np.linspace(mel_min, mel_max, 18)
    fc = 700 * (10**(mel / 2595) - 1)
    np.testing.assert_allclose(fb.fc, fc, rtol=1e-6)


@pytest.mark.parametrize('norm_fn,num_groups', [
    (causal_layer_norm, 1),
    (causal_instance_norm, 4),
])
def test_causal_norm_running_stats(norm_fn, num_groups):
    x = np.random.RandomState(0).randn(2, 4, 50).astype('float32')
    out = norm_fn(jnp.asarray(x))
    # manual check at a few time steps
    for t in [0, 10, 49]:
        if norm_fn is causal_layer_norm:
            seg = x[:, :, :t + 1]
            mean = seg.mean(axis=(1, 2), keepdims=True)
            var = seg.var(axis=(1, 2), keepdims=True)
            expected = (x[:, :, t:t + 1] - mean) / np.sqrt(var + 1e-10)
            np.testing.assert_allclose(
                out[:, :, t], expected[:, :, 0], atol=1e-3)
        else:
            seg = x[:, :, :t + 1]
            mean = seg.mean(axis=2, keepdims=True)
            var = seg.var(axis=2, keepdims=True)
            expected = (x[:, :, t:t + 1] - mean) / np.sqrt(var + 1e-10)
            np.testing.assert_allclose(
                out[:, :, t], expected[:, :, 0], atol=1e-3)


def test_causal_norm_is_causal():
    """A NaN at time t must not contaminate frames before t."""
    x = np.random.RandomState(0).randn(1, 4, 30).astype('float32')
    x[:, :, 20] = np.nan
    for fn in (causal_layer_norm, causal_instance_norm,
               lambda v: causal_group_norm(v, 2)):
        out = np.asarray(fn(jnp.asarray(x)))
        assert not np.isnan(out[:, :, :20]).any()
        assert np.isnan(out[:, :, 20:]).all()


def test_causal_group_norm_affine():
    x = np.random.RandomState(0).randn(2, 4, 10).astype('float32')
    gain = jnp.asarray(np.full(4, 2.0, dtype='float32'))
    bias = jnp.asarray(np.full(4, 1.0, dtype='float32'))
    base = causal_group_norm(jnp.asarray(x), 2)
    affine = causal_group_norm(jnp.asarray(x), 2, gain, bias)
    np.testing.assert_allclose(affine, base * 2 + 1, atol=1e-5)


def test_first_order_smooth_matches_loop():
    x = np.random.RandomState(5).randn(3, 20).astype('float32')
    alpha = 0.8
    got = np.asarray(first_order_smooth(jnp.asarray(x), alpha))
    expected = np.zeros_like(x)
    prev = np.zeros(3, dtype='float32')
    for t in range(20):
        prev = (1 - alpha) * x[:, t] + alpha * prev
        expected[:, t] = prev
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_feature_extractor_shapes():
    fb = MelFilterbank(n_filters=64, n_fft=512)
    fe = FeatureExtractor(
        ['logfbe', 'ild', 'ipd', 'ic', 'mfcc'], fb, hop_length=256,
    )
    stft = STFT(512, 256)
    x = np.random.RandomState(0).randn(2, 2, 8000).astype('float32')
    spec = stft(jnp.asarray(x))
    feats = fe(spec)
    assert feats.shape[0] == 2
    assert feats.shape[1] == fe.n_features
    assert fe.n_features == 64 * 4 + 39
    # unbatched matches batched
    single = fe(spec[0])
    np.testing.assert_allclose(single, feats[0], atol=1e-4)


def test_feature_extractor_sorted_order():
    fb = MelFilterbank(n_filters=8, n_fft=128)
    fe = FeatureExtractor(['ipd', 'ild'], fb)
    assert fe.features == ['ild', 'ipd']


def test_resampling_round_trip_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 17, 33)
                    .astype('float32'))
    kernel = (1, 3, 3, 1)
    down, padding = downsample_2d(x, kernel, return_padding=True)
    assert down.shape == (1, 3, 9, 17)
    up = upsample_2d(down, kernel, padding)
    assert up.shape == x.shape


def test_resampling_matches_torch():
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F

    x_np = np.random.RandomState(0).randn(2, 3, 16, 16).astype('float32')
    k = np.array([1., 3., 3., 1.], dtype='float32')
    k2 = np.outer(k, k)
    k2 /= k2.sum()

    # torch reference down
    kt = torch.from_numpy(k2)[None, None].tile(3, 1, 1, 1)
    pad = int(np.ceil(4 / 2) - 1)
    ref_down = F.conv2d(torch.from_numpy(x_np), kt, stride=2,
                        padding=pad, groups=3).numpy()
    got_down = np.asarray(downsample_2d(jnp.asarray(x_np), k))
    np.testing.assert_allclose(got_down, ref_down, atol=1e-5)

    # torch reference up
    ref_up = F.conv_transpose2d(
        torch.from_numpy(ref_down), kt * 4, stride=2,
        padding=(4 - 1) // 2, groups=3,
    ).numpy()
    got_up = np.asarray(upsample_2d(jnp.asarray(got_down), k))
    np.testing.assert_allclose(got_up, ref_up, atol=1e-5)


@pytest.mark.parametrize('shape,fmt', [
    ((2, 3, 17, 33), 'NCHW'),
    ((2, 3, 16, 32), 'NCHW'),
    ((2, 17, 33, 3), 'NHWC'),
])
def test_resampling_shift_mode_matches_conv(shape, fmt, monkeypatch):
    """The ``shift`` mode (separable strided-slice taps, no conv patch
    tensor) is numerically identical to the conv lowering for both
    directions, odd and even shapes, values and gradients."""
    import jax

    from brever_tpu.ops import resampling as R

    x = jnp.asarray(np.random.RandomState(3).randn(*shape)
                    .astype('float32'))
    kernel = (1, 3, 3, 1)

    def both(mode):
        monkeypatch.setenv('BREVER_RESAMPLE_MODE', mode)

        def f(x):
            down, padding = downsample_2d(
                x, kernel, return_padding=True, data_format=fmt)
            up = upsample_2d(down, kernel, padding, data_format=fmt)
            return down, up

        down, up = f(x)
        g = jax.grad(lambda x: (f(x)[1] ** 2).sum())(x)
        return np.asarray(down), np.asarray(up), np.asarray(g)

    ref = both('fold')
    got = both('shift')
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, atol=2e-5)
    assert R._depthwise_mode() == 'shift'


def test_pallas_stft_matches_jnp_interpret():
    """Fused Pallas STFT kernel == jnp path (interpreter mode on CPU)."""
    from unittest import mock
    import brever_tpu.ops.pallas.stft_kernel as pk
    x = np.random.RandomState(0).randn(2, 8192).astype('float32')
    stft_jnp = STFT(512, 256, backend='jnp')
    want = np.asarray(stft_jnp(jnp.asarray(x)))
    with mock.patch.object(pk.pl, 'pallas_call',
                           functools.partial(pk.pl.pallas_call,
                                             interpret=True)):
        stft_pal = STFT(512, 256, backend='pallas')
        got = np.asarray(stft_pal(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.abs(got), np.abs(want), atol=2e-3)
    np.testing.assert_allclose(got.real, want.real, atol=2e-3)


# ---------------------------------------------------------------------------
# memory-lean LSTM scan (models/rnn.py custom VJP)

def test_lstm_scan_custom_vjp_matches_autodiff():
    """lstm_scan's backward (gate recompute from saved h/c + reverse
    elementwise scan) must match differentiating the plain scan."""
    import jax
    from brever_tpu.models.rnn import _lstm_scan_impl, lstm_scan

    rng = np.random.RandomState(0)
    for shape, wshape in [((12, 5, 16), (16, 64)),       # LSTM (T,B,h)
                          ((9, 2, 3, 16), (2, 16, 64))]:  # BLSTM dirs
        gates_x = jnp.asarray(rng.randn(*shape[:-1], 64).astype('f'))
        w_hh = jnp.asarray(rng.randn(*wshape).astype('f') * 0.2)

        def loss_custom(gx, w):
            return (lstm_scan(gx, w, 4) ** 2).sum()

        def loss_plain(gx, w):
            return (_lstm_scan_impl(gx, w, 4)[0] ** 2).sum()

        np.testing.assert_allclose(
            float(loss_custom(gates_x, w_hh)),
            float(loss_plain(gates_x, w_hh)), rtol=1e-6)
        gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(gates_x, w_hh)
        gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(gates_x, w_hh)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p),
                                   rtol=1e-4, atol=1e-5)


def test_blstm_matches_torch_lstm():
    """BLSTM output parity with torch nn.LSTM(bidirectional=True) on
    shared weights (parameter layout contract)."""
    import torch
    from brever_tpu.models.rnn import BLSTM

    rng = np.random.RandomState(1)
    batch, time, feat, hidden = 2, 11, 8, 12
    x = rng.randn(batch, time, feat).astype('float32')
    mod = BLSTM(hidden_size=hidden)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables['params']

    ref = torch.nn.LSTM(feat, hidden, batch_first=True,
                        bidirectional=True)
    with torch.no_grad():
        for d, suffix in enumerate(['', '_reverse']):
            getattr(ref, f'weight_ih_l0{suffix}').copy_(
                torch.tensor(np.asarray(p['w_ih'][d]).T))
            getattr(ref, f'weight_hh_l0{suffix}').copy_(
                torch.tensor(np.asarray(p['w_hh'][d]).T))
            getattr(ref, f'bias_ih_l0{suffix}').copy_(
                torch.tensor(np.asarray(p['b_ih'][d])))
            getattr(ref, f'bias_hh_l0{suffix}').copy_(
                torch.tensor(np.asarray(p['b_hh'][d])))
        want, _ = ref(torch.tensor(x))
    got = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)
