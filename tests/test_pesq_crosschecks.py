"""In-environment PESQ plausibility cross-checks (VERDICT r4 item 7).

The canonical ITU P.862 wheel cannot be installed here, so a measured
|dMOS| bound against it is impossible in-env (see brever_tpu/pesq.py
provenance note; scripts/check_pesq_parity.py records the bound on any
host where the wheel installs).  These tests bound the approximation's
*consequences* instead:

1. pesq_approx must rank a matrix of qualitatively different
   degradations (additive noise, lowpass, clipping) consistently with
   the exactly-implemented ESTOI and with severity within each family.
2. Published P.862 behavior: level alignment makes the score invariant
   to a pure gain on the degraded signal (the canonical library
   normalizes both signals to a target active speech level,
   reference brever/metrics.py:47-99 scoring path).
3. The MetricGAN training target (normalized pesq in [0, 1],
   brever_tpu/models/metricgan.py:_host_metrics) must be insensitive
   to table-level deviations of the magnitude the analytic Bark
   band/threshold derivation can plausibly differ from the ITU tables
   by: warping the band grid by +/-0.15 Bark and the absolute hearing
   threshold by +/-1 dB moves the [0, 1] target by < 0.05 and never
   reorders it.
"""

import numpy as np
import pytest

from brever_tpu.metrics import MetricRegistry
from tests.test_metrics import _speech_noise


def _spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def _lowpass(x, fs, cutoff):
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
    spec[freqs > cutoff] = 0.0
    return np.fft.irfft(spec, len(x))


def _degradation_matrix(clean, fs, seed=0):
    """(label, degraded) cells: 3 families x 3 severities."""
    rng = np.random.RandomState(seed)
    noise = rng.randn(len(clean))
    cells = []
    for snr_db in (20.0, 10.0, 0.0):
        g = np.sqrt((clean**2).mean() / (noise**2).mean()
                    / 10.0 ** (snr_db / 10.0))
        cells.append((f'noise{snr_db:g}', clean + g * noise))
    for cutoff in (6000.0, 3000.0, 1500.0):
        cells.append((f'lp{cutoff:g}', _lowpass(clean, fs, cutoff)))
    peak = np.abs(clean).max()
    for clip in (0.5, 0.15, 0.05):
        cells.append((f'clip{clip:g}',
                      np.clip(clean, -clip * peak, clip * peak)))
    return cells


def test_pesq_degradation_matrix_orders_like_estoi():
    """Severity-monotonic within each family; cross-metric rank
    agreement with ESTOI >= 0.8 across the whole matrix."""
    fs = 16000
    pesq_m = MetricRegistry.get('pesq')
    estoi_m = MetricRegistry.get('estoi')
    clean = _speech_noise(7, 3 * fs)
    cells = _degradation_matrix(clean, fs)
    pesq_s = np.array([pesq_m(d, clean, batched=False) for _, d in cells])
    estoi_s = np.array([estoi_m(d, clean, batched=False) for _, d in cells])
    for fam in range(3):
        s = pesq_s[3 * fam:3 * fam + 3]
        assert s[0] > s[1] > s[2], (cells[3 * fam][0], s)
    rho = _spearman(pesq_s, estoi_s)
    assert rho >= 0.8, (rho, list(zip([l for l, _ in cells],
                                      pesq_s, estoi_s)))


def test_pesq_level_alignment_invariance():
    """P.862 normalizes both signals to a target active level: a pure
    gain on the degraded signal must not move the score."""
    from brever_tpu.pesq import pesq as pesq_fn
    fs = 16000
    clean = _speech_noise(8, 2 * fs)
    deg = clean + 0.2 * np.random.RandomState(9).randn(len(clean))
    base = pesq_fn(fs, clean, deg, 'wb')
    for gain in (0.25, 4.0):
        np.testing.assert_allclose(
            pesq_fn(fs, clean, gain * deg, 'wb'), base, atol=0.02)


@pytest.fixture
def perturbed_pesq_tables():
    """Context: warp the analytic table generators (band grid by a
    smooth +/-0.15 Bark ripple, hearing threshold by a +/-1 dB ripple)
    and clear the per-(fs, mode) config cache so scores rebuild from
    the warped tables.  Restores everything afterwards."""
    import brever_tpu.pesq as P

    orig_bark = P._bark
    orig_thresh = P._terhardt_threshold_db

    def enter(seed):
        rng = np.random.RandomState(seed)
        phase_b, phase_t = rng.uniform(0, 2 * np.pi, 2)
        sign = rng.choice([-1.0, 1.0])

        def warped_bark(f):
            z = orig_bark(f)
            return z + sign * 0.15 * np.sin(z + phase_b)

        def warped_thresh(f):
            db = orig_thresh(f)
            return db + 1.0 * np.sin(
                orig_bark(f) * 1.7 + phase_t)

        P._bark = warped_bark
        P._terhardt_threshold_db = warped_thresh
        P._Config._cache.clear()

    yield enter
    P._bark = orig_bark
    P._terhardt_threshold_db = orig_thresh
    P._Config._cache.clear()


def test_metricgan_target_insensitive_to_table_deviation(
        perturbed_pesq_tables):
    """The GAN discriminator target — normalized pesq in [0, 1]
    (models/metricgan.py:_host_metrics) — over a batch spanning the
    useful degradation range must move < 0.05 and keep its exact
    ordering under table deviations of the plausible analytic-vs-ITU
    magnitude.  This bounds how much the documented deviation can
    steer MetricGAN training relative to the reference."""
    import brever_tpu.pesq as P
    fs = 16000
    pesq_m = MetricRegistry.get('pesq')
    clean = _speech_noise(10, 2 * fs)
    rng = np.random.RandomState(11)
    noise = rng.randn(len(clean))
    batch = [clean + s * noise for s in
             (0.02, 0.08, 0.2, 0.45, 0.9, 1.8)]

    def targets():
        return np.array([pesq_m(d, clean, normalized=True, batched=False)
                         for d in batch])

    P._Config._cache.clear()
    base = targets()
    assert np.all(np.diff(base) < 0)  # spans a strictly ordered range
    for seed in (0, 1):
        perturbed_pesq_tables(seed)
        pert = targets()
        dmax = np.abs(pert - base).max()
        assert dmax < 0.05, (seed, dmax, base, pert)
        assert np.all(np.diff(pert) < 0), (seed, pert)
        assert _spearman(base, pert) == 1.0
