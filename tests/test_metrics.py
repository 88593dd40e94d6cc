"""Metric contracts: batched vs unbatched parity, sanity ordering
(clean > noisy), lengths handling (reference tests/test_metrics.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.metrics import MetricRegistry, estoi, sisnr, snr, stoi


def _speech_like(seed, n=16000 * 2):
    """Amplitude-modulated multi-tone — enough structure for STOI."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t + rng.rand() * 6))
    carrier = sum(
        np.sin(2 * np.pi * f * t + rng.rand() * 6)
        for f in (220, 440, 880, 1760, 3000)
    )
    return (env * carrier).astype('float32')


def test_stoi_clean_is_one():
    x = _speech_like(0)
    assert stoi(x, x, batched=False) > 0.99
    assert estoi(x, x, batched=False) > 0.99


def test_stoi_orders_by_noise():
    x = _speech_like(0)
    rng = np.random.RandomState(1)
    noise = rng.randn(len(x)).astype('float32')
    light = x + 0.05 * noise
    heavy = x + 2.0 * noise
    s_light = stoi(light, x, batched=False)
    s_heavy = stoi(heavy, x, batched=False)
    assert s_light > s_heavy
    e_light = estoi(light, x, batched=False)
    e_heavy = estoi(heavy, x, batched=False)
    assert e_light > e_heavy


@pytest.mark.parametrize('metric', [stoi, estoi])
def test_stoi_batched_matches_per_item(metric):
    rng = np.random.RandomState(2)
    max_len = 16000 * 2
    lengths = [max_len, 16000 * 2 - 1000, 16000 + 4096]
    clean = np.stack([_speech_like(i, max_len) for i in range(3)])
    noisy = clean + 0.3 * rng.randn(*clean.shape).astype('float32')
    for i, n in enumerate(lengths):
        clean[i, n:] = 0
        noisy[i, n:] = 0
    batched = metric(noisy, clean, lengths=lengths)
    for i, n in enumerate(lengths):
        single = metric(noisy[i, :n], clean[i, :n], batched=False)
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


@pytest.mark.parametrize('metric_name', ['snr', 'sisnr'])
def test_snr_metrics_batched_parity(metric_name):
    metric = MetricRegistry.get(metric_name)
    rng = np.random.RandomState(3)
    max_len = 4000
    lengths = [4000, 3000, 2500]
    y = rng.randn(3, max_len).astype('float32')
    x = y + 0.1 * rng.randn(3, max_len).astype('float32')
    for i, n in enumerate(lengths):
        x[i, n:] = 0
        y[i, n:] = 0
    batched = np.asarray(metric(jnp.asarray(x), jnp.asarray(y),
                                lengths=jnp.asarray(lengths)))
    for i, n in enumerate(lengths):
        single = metric(jnp.asarray(x[i, :n]), jnp.asarray(y[i, :n]))
        np.testing.assert_allclose(batched[i], single, rtol=1e-4, atol=1e-4)


def test_snr_metric_sign():
    """Metric is positive SNR (negated loss)."""
    y = _speech_like(4, 8000)
    x = y + 0.01 * np.random.RandomState(5).randn(8000).astype('float32')
    assert snr(jnp.asarray(x), jnp.asarray(y)) > 20
    assert sisnr(jnp.asarray(x), jnp.asarray(y)) > 20


def test_pesq_registered_but_gated():
    assert 'pesq' in MetricRegistry.keys()
    x = np.zeros(16000, dtype='float32')
    try:
        import pesq  # noqa: F401
        has_pesq = True
    except ImportError:
        has_pesq = False
    if not has_pesq:
        with pytest.raises(RuntimeError, match='pesq'):
            MetricRegistry.get('pesq')(x, x)


def test_metric_registry_keys():
    assert set(MetricRegistry.keys()) >= {
        'pesq', 'stoi', 'estoi', 'snr', 'sisnr'}


def test_stoi_too_short_raises():
    x = _speech_like(0, 2000)
    with pytest.raises(RuntimeError):
        stoi(x, x, batched=False)
