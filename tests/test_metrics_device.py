"""On-device metric twins vs the host f64 implementations.

The device metrics (brever_tpu/metrics_device.py) re-express the host
algorithms (stoi.py, pesq.py) as static-shape jax graphs; these tests
pin the f32-vs-f64 deviation on realistic enhancement-style signals
(clean speech-ish reference + noise at several SNRs, varied lengths).
"""

import numpy as np
import pytest

import brever_tpu.metrics as host_metrics
from brever_tpu.metrics_device import (
    DEVICE_METRICS,
    _resample_poly_jnp,
    estoi_device,
    sisnr_device,
    snr_device,
    stoi_device,
)


def _speechy(rng, n, fs=16000):
    """Modulated multi-tone + noise burst: enough structure for the
    silent-frame VAD to both keep and drop frames."""
    t = np.arange(n) / fs
    env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    sig = env * (
        np.sin(2 * np.pi * 220 * t)
        + 0.5 * np.sin(2 * np.pi * 870 * t)
        + 0.2 * np.sin(2 * np.pi * 1800 * t))
    return (sig + 0.01 * rng.randn(n)).astype(np.float64)


def _pairs(n_items=4, tmax=24000):
    rng = np.random.RandomState(0)
    lengths = np.array([tmax, tmax - 1111, tmax - 4096, 20011])
    deg = np.zeros((n_items, tmax))
    ref = np.zeros((n_items, tmax))
    for i, (n, snr_db) in enumerate(zip(lengths, [20, 5, 0, -5])):
        clean = _speechy(rng, int(n))
        noise = rng.randn(int(n)) * np.sqrt(
            np.mean(clean ** 2) / 10 ** (snr_db / 10))
        ref[i, :n] = clean
        deg[i, :n] = clean + noise
    return deg, ref, lengths


def test_resample_matches_scipy():
    from brever_tpu.stoi import _resample_oct
    rng = np.random.RandomState(1)
    x = rng.randn(3, 16000).astype(np.float64)
    got = np.asarray(_resample_poly_jnp(
        np.asarray(x, np.float32), 16000, 10000))
    for i in range(3):
        want = _resample_oct(x[i], 10000, 16000)
        assert got[i].shape == want.shape
        scale = np.abs(want).max()
        np.testing.assert_allclose(got[i], want, atol=2e-5 * scale)


@pytest.mark.parametrize('extended', [False, True])
def test_stoi_device_matches_host(extended):
    deg, ref, lengths = _pairs()
    fn = estoi_device if extended else stoi_device
    got = np.asarray(fn(deg, ref, lengths=lengths))
    want = host_metrics.estoi(deg, ref, lengths=lengths) if extended \
        else host_metrics.stoi(deg, ref, lengths=lengths)
    want = np.asarray(want)
    # f32 vs f64 + reduction order; scores live in [0, 1]
    np.testing.assert_allclose(got, want, atol=2e-3)
    if not extended:
        # sanity: classic STOI ranks the SNR conditions on these
        # synthetics (ESTOI's row/col normalization legitimately does
        # not rank pure-tone material — host agrees with device)
        assert got[0] > got[2] > got[3]


def test_stoi_device_too_short_returns_sentinel():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4000)
    out = np.asarray(stoi_device(x, x + 0.1 * rng.randn(2, 4000),
                                 lengths=[4000, 3000]))
    assert np.allclose(out, 1e-5)


def test_snr_sisnr_device_match_host():
    deg, ref, lengths = _pairs()
    for dev_fn, name in ((snr_device, 'snr'), (sisnr_device, 'sisnr')):
        got = np.asarray(dev_fn(deg, ref, lengths=lengths))
        want = np.asarray(
            host_metrics.MetricRegistry.get(name)(
                deg, ref, lengths=lengths))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_device_registry_covers_default_val_metrics():
    # the trainer's default val_metrics must all have device twins so
    # validation never fetches audio to the host
    for name in ('estoi', 'snr'):
        assert name in DEVICE_METRICS


def test_pesq_device_matches_host():
    """Device PESQ vs the host implementation on aligned signals (the
    enhancement case, where the two pipelines coincide by design)."""
    from brever_tpu.metrics_device import pesq_device
    from brever_tpu.pesq import pesq as pesq_host

    deg, ref, lengths = _pairs()
    got = np.asarray(pesq_device(deg, ref, lengths=lengths))
    want = np.array([
        pesq_host(16000, ref[i, :n], deg[i, :n], mode='wb')
        for i, n in enumerate(lengths)
    ])
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert got[0] > got[2] > got[3]


def test_pesq_device_identity_maximum():
    from brever_tpu.metrics_device import pesq_device
    rng = np.random.RandomState(3)
    x = _speechy(rng, 20000)[None]
    score = float(np.asarray(pesq_device(x, x))[0])
    # the published wb hard bound (host pins the same value)
    np.testing.assert_allclose(score, 4.643888749336258, atol=2e-3)


def test_pesq_device_nb_mode():
    from brever_tpu.metrics_device import pesq_device
    from brever_tpu.pesq import pesq as pesq_host

    deg, ref, lengths = _pairs()
    deg, ref, lengths = deg[:2], ref[:2], lengths[:2]
    got = np.asarray(pesq_device(deg, ref, lengths=lengths, mode='nb'))
    want = np.array([
        pesq_host(16000, ref[i, :n], deg[i, :n], mode='nb')
        for i, n in enumerate(lengths)
    ])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_device_metrics_ragged_boundary_lengths():
    """Masking off-by-ones live at the boundaries: minimal PESQ length
    (0.25 s), STOI's 30-frame threshold neighborhood, hop-aligned and
    hop-misaligned lengths — all scored in ONE padded batch (one
    compile) and compared item-by-item against the host."""
    from brever_tpu.metrics_device import pesq_device
    from brever_tpu.pesq import pesq as pesq_host
    from brever_tpu.stoi import stoi_single

    rng = np.random.RandomState(7)
    tmax = 16000
    # 4000 = pesq minimum; 6400/6401 straddle a 10 kHz frame edge
    # after resampling; 8192/12800 mid-range; tmax exact
    lengths = np.array([4000, 6400, 6401, 8192, 12800, tmax])
    b = len(lengths)
    ref = np.zeros((b, tmax))
    deg = np.zeros((b, tmax))
    for i, n in enumerate(lengths):
        c = _speechy(rng, int(n))
        ref[i, :n] = c
        deg[i, :n] = c + 0.2 * rng.randn(int(n))

    got_stoi = np.asarray(stoi_device(deg, ref, lengths=lengths))
    want_stoi = np.array([
        stoi_single(deg[i, :n], ref[i, :n], 16000, False)
        for i, n in enumerate(lengths)
    ])
    np.testing.assert_allclose(got_stoi, want_stoi, atol=2e-3)

    got_pesq = np.asarray(pesq_device(deg, ref, lengths=lengths))
    want_pesq = np.array([
        pesq_host(16000, ref[i, :n], deg[i, :n], mode='wb')
        for i, n in enumerate(lengths)
    ])
    np.testing.assert_allclose(got_pesq, want_pesq, atol=5e-3)
