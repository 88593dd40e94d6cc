"""Metric contracts: batched vs unbatched parity, sanity ordering
(clean > noisy), lengths handling (reference tests/test_metrics.py)."""

import warnings

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


@pytest.mark.parametrize('extended', [False, True])
def test_stoi_vectorized_matches_per_item(extended):
    """stoi_batch_vectorized == stoi_single per item (rtol 1e-6).

    Covers ragged lengths, a silence-heavy item (exercises the
    silent-frame compaction), and a too-short-to-frame item (NaN).
    """
    from brever_tpu.stoi import stoi_batch_vectorized, stoi_single

    rng = np.random.RandomState(7)
    max_len = 16000 * 2
    lengths = [max_len, max_len - 1000, 16000 + 4096, 100]
    clean = np.stack([_speech_like(i, max_len) for i in range(4)])
    clean[2, 8000:24000] *= 1e-6          # long near-silent stretch
    noisy = clean + 0.3 * rng.randn(*clean.shape).astype('float32')
    for i, n in enumerate(lengths):
        clean[i, n:] = 0
        noisy[i, n:] = 0
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        batched = stoi_batch_vectorized(
            noisy, clean, 16000, extended, lengths=lengths)
        for i, n in enumerate(lengths[:3]):
            single = stoi_single(noisy[i, :n], clean[i, :n],
                                 16000, extended)
            np.testing.assert_allclose(batched[i], single, rtol=1e-6)
    assert np.isnan(batched[3])   # too short to frame -> NaN


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


def test_metric_registry_keys():
    assert set(MetricRegistry.keys()) >= {
        'pesq', 'stoi', 'estoi', 'snr', 'sisnr'}


def test_stoi_short_returns_sentinel():
    """pystoi parity: <30 frames after silence removal warns + 1e-5."""
    x = _speech_like(0, 2000)
    with pytest.warns(UserWarning, match='not enough STFT frames'):
        assert stoi(x, x, batched=False) == 1e-5


def _speech_noise(seed, n):
    """Broadband speech-shaped noise with syllabic modulation."""
    import scipy.signal
    rng = np.random.RandomState(seed)
    x = rng.randn(n)
    b, a = scipy.signal.butter(2, [100 / 8000, 4000 / 8000], 'bandpass')
    x = scipy.signal.lfilter(b, a, x)
    t = np.arange(n) / 16000
    env = 0.4 + 0.6 * 0.5 * (1 + np.sin(2 * np.pi * 3 * t + rng.rand() * 6))
    return (x * env).astype('float64')


def test_pesq_identity_is_exact_maximum():
    """Identical signals hit the published MOS-LQO hard bounds exactly
    (the same values the canonical library produces:
    reference brever/metrics.py:71-93)."""
    from brever_tpu.pesq import pesq as pesq_fn
    x = _speech_noise(0, 32000)
    np.testing.assert_allclose(
        pesq_fn(16000, x, x, 'wb'), 4.643888749336258, rtol=1e-12)
    np.testing.assert_allclose(
        pesq_fn(16000, x, x, 'nb'), 4.548638319075995, rtol=1e-12)


def test_pesq_delay_invariance():
    """A purely delayed copy is realigned and scores the maximum.

    The signal fades to silence before the end so the tail samples a
    global shift pushes out of the buffer carry no content.
    """
    from brever_tpu.pesq import pesq as pesq_fn
    x = _speech_noise(1, 32000)
    x[-2000:] = 0.0
    d = np.concatenate([np.zeros(160), x[:-160]])
    np.testing.assert_allclose(
        pesq_fn(16000, x, d, 'wb'), 4.643888749336258, rtol=1e-9)


def test_pesq_per_utterance_alignment():
    """A delay that CHANGES between utterances is recovered by the
    per-utterance alignment (a single global delay cannot fix both
    utterances at once, P.862's motivation for utterance splitting)."""
    from brever_tpu.pesq import pesq as pesq_fn
    fs = 16000
    rng = np.random.RandomState(4)
    env = np.zeros(4 * fs)
    for start, dur in [(0.2, 0.8), (1.4, 0.9), (2.8, 0.9)]:
        i0, i1 = int(start * fs), int((start + dur) * fs)
        env[i0:i1] = np.hanning(i1 - i0)
    ref = env * rng.randn(len(env)) * 0.1
    # first utterance delayed 200 samples, the rest 350
    deg = np.concatenate([np.zeros(200), ref[:-200]])
    cut = int(1.2 * fs)
    deg[cut:] = np.concatenate([np.zeros(150), deg[cut:-150]])
    assert pesq_fn(fs, ref, deg, 'wb') > 4.5


def test_pesq_bad_intervals_unit():
    """Interval finder: runs of > THRESHOLD_BAD_FRAMES frames qualify
    only at >= MIN_BAD_FRAMES consecutive frames."""
    from brever_tpu.pesq import _bad_intervals
    d = np.zeros(40)
    d[3:6] = 40.0          # 3 frames: too short
    d[10:15] = 40.0        # exactly 5: qualifies
    d[20:30] = 31.0        # 10 frames: qualifies
    d[35:] = 40.0          # 5 frames at the tail: qualifies
    assert _bad_intervals(d) == [(10, 15), (20, 30), (35, 40)]
    assert _bad_intervals(np.zeros(10)) == []


def test_pesq_bad_interval_realignment():
    """A delay that drifts INSIDE one continuous utterance defeats the
    per-utterance alignment (one delay per utterance); the P.862
    bad-interval realignment re-searches the delay over the
    high-disturbance runs and recovers part of the score.  The
    recovery is bounded by design: only frames above the disturbance
    threshold (30) realign, and a realigned frame keeps the minimum of
    the two disturbances, so the score can only improve."""
    from brever_tpu.pesq import pesq as pesq_fn
    fs = 16000
    rng = np.random.RandomState(11)
    n = 4 * fs
    # tone hopping (new tone every 32 ms frame): a misaligned frame
    # compares entirely different spectra, driving its disturbance
    # over the bad-frame threshold
    seg = int(0.032 * fs)
    freqs = rng.uniform(300, 3000, n // seg + 2)
    phase = 2 * np.pi * np.cumsum(np.repeat(freqs, seg)[:n]) / fs
    ref = 0.1 * np.sin(phase)
    # second half lags an extra 150 ms (inside the search buffer)
    half = 2 * fs
    deg = ref.copy()
    deg[half:] = np.concatenate([np.zeros(2400), ref[half:-2400]])
    base = pesq_fn(fs, ref, deg, 'wb', realign=False)
    fixed = pesq_fn(fs, ref, deg, 'wb')
    assert fixed > base + 0.1, (base, fixed)
    # perfectly aligned input must be unaffected by the realignment
    clean_score = pesq_fn(fs, ref, ref, 'wb')
    assert clean_score == pesq_fn(fs, ref, ref, 'wb', realign=False)


def test_pesq_monotonic_with_noise():
    from brever_tpu.pesq import pesq as pesq_fn
    clean = _speech_noise(2, 32000)
    rng = np.random.RandomState(3)
    noise = rng.randn(len(clean))
    scores = [pesq_fn(16000, clean, clean + s * noise, 'wb')
              for s in (0.0, 0.1, 0.5, 2.0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores


def test_pesq_batched_matches_per_item():
    """Pool-batched path == per-item path, with lengths slicing
    (reference contract: brever/tests/test_metrics.py)."""
    pesq_metric = MetricRegistry.get('pesq')
    rng = np.random.RandomState(4)
    max_len = 32000
    lengths = [32000, 28000, 21000]
    clean = np.stack([_speech_noise(i, max_len) for i in range(3)])
    noisy = clean + 0.2 * rng.randn(*clean.shape)
    for i, n in enumerate(lengths):
        clean[i, n:] = 0
        noisy[i, n:] = 0
    batched = pesq_metric(noisy, clean, lengths=lengths)
    for i, n in enumerate(lengths):
        single = pesq_metric(noisy[i, :n], clean[i, :n], batched=False)
        np.testing.assert_allclose(batched[i], single, rtol=1e-9)


def test_pesq_normalized_bounds():
    pesq_metric = MetricRegistry.get('pesq')
    x = _speech_noise(5, 32000)
    noisy = x + 0.3 * np.random.RandomState(6).randn(len(x))
    out = pesq_metric(noisy, x, normalized=True)
    assert 0.0 <= out <= 1.0
    assert pesq_metric(x, x, normalized=True) == pytest.approx(1.0)


# Golden regression vectors, pinned from this repo's implementations
# (the canonical pesq/pystoi libraries are not installable in this
# environment; STOI/ESTOI follow pystoi's published numerics exactly —
# see brever_tpu/metrics.py docstring — and PESQ's documented
# deviations are in brever_tpu/pesq.py). Any unintended numeric drift
# in the metric stack fails here.
_GOLDEN = [
    # (seed, n, noise_scale, stoi, estoi, pesq_wb, pesq_nb)
    (0, 32000, 0.1, 0.990165329942, 0.970342674461,
     4.378079280832, 4.472070175498),
    (1, 24000, 0.3, 0.909939880491, 0.793009278170,
     4.004775181792, 4.234610110435),
    (2, 48000, 1.0, 0.438573727038, 0.271115824291,
     3.058951915516, 3.566767057688),
    (3, 20000, 0.05, 0.997236155952, 0.991340266939,
     4.492664268119, 4.521139787816),
    (4, 40000, 0.5, 0.783870676379, 0.578550635422,
     3.557556222343, 3.858771790772),
]


@pytest.mark.parametrize('row', _GOLDEN, ids=[str(r[0]) for r in _GOLDEN])
def test_metric_golden_values(row):
    from brever_tpu.pesq import pesq as pesq_fn
    seed, n, scale, g_stoi, g_estoi, g_wb, g_nb = row
    clean = _speech_noise(seed, n)
    noisy = clean + scale * np.random.RandomState(100 + seed).randn(n)
    np.testing.assert_allclose(
        stoi(noisy, clean, batched=False), g_stoi, rtol=1e-9)
    np.testing.assert_allclose(
        estoi(noisy, clean, batched=False), g_estoi, rtol=1e-9)
    np.testing.assert_allclose(
        pesq_fn(16000, clean, noisy, 'wb'), g_wb, rtol=1e-9)
    np.testing.assert_allclose(
        pesq_fn(16000, clean, noisy, 'nb'), g_nb, rtol=1e-9)


def test_pesq_approx_alias():
    """The explicit deviation-labelled name resolves to the same
    implementation as the compat 'pesq' registration."""
    assert MetricRegistry.get('pesq_approx') is MetricRegistry.get('pesq')
