"""In-environment PESQ validity cross-checks (VERDICT r4 item 7).

The canonical ITU-T P.862 wheel is not installable here, so a measured
|dMOS| bound vs the reference scorer (brever/metrics.py:47-99) cannot
be produced in-env. These tests bound the practical consequences
instead:

* ordering: pesq_approx must order degradation severity the same way
  within every degradation family, and agree with ESTOI/SNR rankings
  on an additive-noise ladder (published P.862 behavior);
* training-target insensitivity: a MetricGAN run whose PESQ targets
  are warped by a monotone perturbation of the documented deviation
  scale must produce the same training trajectory to first order —
  i.e. checkpoint selection and GAN targets are robust to a bounded
  score offset, which is the failure mode an unbounded approximation
  could cause (see VERDICT.md "What's missing" #1).
"""

import numpy as np
import pytest

from brever_tpu.metrics import MetricRegistry


def _speech_like(seed, n, fs=16000):
    """Modulated harmonic tone + noise floor (same recipe as the
    metric tests: broadband, speech-band energy, nonstationary)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    f0 = rng.uniform(100, 200)
    x = sum(rng.uniform(0.3, 1.0) / (k + 1)
            * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.7 * t))
    x = x * env + 0.01 * rng.randn(n)
    return (x / np.abs(x).max() * 0.5).astype(np.float64)


def _rankdata(v):
    return np.argsort(np.argsort(v))


def _spearman(a, b):
    ra, rb = _rankdata(a).astype(float), _rankdata(b).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum()
                 / np.sqrt((ra**2).sum() * (rb**2).sum()))


def test_pesq_orders_degradation_families():
    """Within each degradation family, more degradation => lower MOS.

    Families cover distinct distortion classes (additive white noise,
    colored noise, hard clipping, time dropouts, quantization) so the
    check exercises the perceptual model beyond the single
    additive-noise ladder of test_pesq_monotonic_with_noise."""
    from brever_tpu.pesq import pesq as pesq_fn
    n = 24000
    clean = _speech_like(10, n)
    rng = np.random.RandomState(11)
    white = rng.randn(n)
    # pink-ish noise: cumulative-summed white, high-passed lightly
    pink = np.cumsum(rng.randn(n))
    pink = pink - np.convolve(pink, np.ones(50) / 50, mode='same')
    pink /= np.abs(pink).max()

    def clip_at(x, frac):
        lim = frac * np.abs(x).max()
        return np.clip(x, -lim, lim)

    def dropouts(x, length):
        # NESTED severity: a longer zeroed span at the same position.
        # (Dropouts at different positions are not ordered under
        # P.862: the asymmetric disturbance weighting makes a dropout
        # in a loud region cost far more than several in envelope
        # valleys — observed in-env: 5 short dropouts scored above 2.)
        y = x.copy()
        start = n // 3
        y[start:start + length] = 0.0
        return y

    def quantize(x, bits):
        scale = 2.0 ** (bits - 1)
        return np.round(x * scale) / scale

    families = {
        'white': [clean + s * white for s in (0.02, 0.1, 0.4)],
        'pink': [clean + s * pink for s in (0.05, 0.2, 0.8)],
        'clip': [clip_at(clean, f) for f in (0.6, 0.3, 0.1)],
        'dropout': [dropouts(clean, k) for k in (800, 3200, 9600)],
        'quantize': [quantize(clean, b) for b in (7, 5, 3)],
    }
    for name, degraded in families.items():
        scores = [pesq_fn(16000, clean, d, 'wb') for d in degraded]
        assert all(a > b for a, b in zip(scores, scores[1:])), \
            (name, scores)


def test_pesq_rank_agrees_with_estoi_and_snr_on_noise_ladder():
    """On an SNR ladder, PESQ / ESTOI / SNR must agree on the ranking
    exactly (Spearman 1.0): all three are strictly monotone in
    additive-noise level, a published behavior of P.862."""
    from brever_tpu.pesq import pesq as pesq_fn
    n = 24000
    clean = _speech_like(12, n)
    noise = np.random.RandomState(13).randn(n)
    scales = (0.01, 0.05, 0.1, 0.2, 0.5, 1.0)
    degraded = [clean + s * noise for s in scales]
    p = [pesq_fn(16000, clean, d, 'wb') for d in degraded]
    estoi = MetricRegistry.get('estoi')
    snr = MetricRegistry.get('snr')
    e = [float(estoi(d, clean, batched=False)) for d in degraded]
    s = [float(np.asarray(snr(d[None], clean[None]))[0])
         for d in degraded]
    assert _spearman(p, e) == pytest.approx(1.0)
    assert _spearman(p, s) == pytest.approx(1.0)


@pytest.mark.slow
def test_metricgan_target_insensitive_to_pesq_deviation(tmp_path):
    """MetricGAN trained against pesq_approx vs a deviation-warped
    pesq_approx produces the same first-epoch trajectory to first
    order.

    The warp is monotone and bounded by 0.05 in normalized-score
    space (~0.23 MOS — well above any plausible |dMOS| of the
    from-scratch scorer, whose algorithmic structure now matches
    P.862): if training is insensitive to THIS, it is insensitive to
    the real deviation. Discriminator loss is an MSE against the
    [0, 1] targets, so a bounded target shift must produce a bounded
    loss shift, not a divergent trajectory."""
    import os

    from brever_tpu.models import ModelRegistry
    from test_training import make_trainer
    from utils import DummyDataset

    def run(warp, workdir):
        model = ModelRegistry.get('metricganokd')(
            target_metrics=['pesq'], inference_metric='pesq',
            generator_lstm_hidden_size=16, generator_fc_channels=[16],
            discriminator_conv_channels=[4, 8],
            discriminator_fc_channels=[8])
        orig = model._score

        if warp:
            def warped(deg, ref, lengths=None):
                s = orig(deg, ref, lengths=lengths)
                return np.clip(s + 0.05 * np.sin(7.0 * s), 0.0, 1.0)
            model._score = warped
        os.makedirs(workdir)
        trainer = make_trainer(
            workdir, model, epochs=1,
            train_dataset=DummyDataset(n_items=4, min_length=0.9,
                                       max_length=1.0),
            val_dataset=DummyDataset(n_items=2, min_length=0.9,
                                     max_length=1.0, seed=7))
        trainer.run()
        return trainer.loss_logger.train_loss[0]

    stock = run(False, tmp_path / 'stock')
    warped = run(True, tmp_path / 'warped')
    assert all(np.isfinite(v) for v in stock.values())
    assert all(np.isfinite(v) for v in warped.values())
    # same batches, same seeds: the bounded target shift may move the
    # losses, but not change their scale or sign structure
    assert warped['loss_d'] == pytest.approx(stock['loss_d'], abs=0.2)
    assert warped['loss_g'] == pytest.approx(stock['loss_g'], abs=0.2)
