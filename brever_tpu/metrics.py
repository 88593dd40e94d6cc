"""Objective speech metrics: PESQ / STOI / ESTOI / SNR / SI-SNR.

Mirrors the reference metric registry surface (reference
brever/metrics.py:16-150). Differences forced by this environment:

* ``pystoi``/``batch_pystoi`` are not installed, so STOI and ESTOI are
  implemented here from the published algorithms (Taal et al., ICASSP
  2011; Jensen & Taal, TASLP 2016) with the standard constants
  (10 kHz, 256/512 frames, 15 one-third octave bands from 150 Hz,
  384 ms segments, beta = -15 dB, 40 dB VAD range) and pystoi's exact
  numerics: float64 eps, the Octave-compatible kaiser-window
  resampler, frames laid out as ``range(0, len(x) - frame, hop)``
  (the exactly-fitting final frame is dropped), and warn-and-return
  1e-5 on signals with fewer than 30 frames after silence removal.
  The one intentional difference: pystoi perturbs the ESTOI
  normalization with eps-scaled random noise; we stay deterministic
  (divergence bounded by ~1e-8). Host-side numpy — metrics run during
  validation off the device hot path.
* ``pesq`` (ITU-T P.862 C library) cannot be installed here, so PESQ
  is scored by the in-repo implementation of P.862/P.862.2
  (:mod:`brever_tpu.pesq`) with the reference's batched Pool
  orchestration; see that module's docstring for documented
  deviations from the canonical code.

Contract: all metrics give identical results batched-padded vs
per-item (lengths argument), like the reference.
"""

import numpy as np

from .criterion import CriterionRegistry
from .registry import Registry
from .stoi import stoi_batch, stoi_single

MetricRegistry = Registry('metric')


def _to_numpy(x):
    if x is None:
        return None
    return np.asarray(x)


def _stoi(x, y, fs, extended, batched, lengths):
    """Dispatch over batch/lengths like the reference wrapper
    (brever/metrics.py:19-44). Batched 2-D scoring runs the items
    process-parallel through the shared spawn pool."""
    x, y, lengths = _to_numpy(x), _to_numpy(y), _to_numpy(lengths)
    if x.ndim == 1:
        if lengths is not None and not batched:
            raise ValueError('Non-batched stoi does not support lengths '
                             'argument for 1D inputs.')
        return stoi_single(x, y, fs, extended)
    if batched:
        return stoi_batch(x, y, fs, extended, lengths)
    if lengths is None:
        lengths = [x.shape[-1]] * x.shape[0]
    return np.array([
        stoi_single(xi[:n], yi[:n], fs, extended)
        for xi, yi, n in zip(x, y, lengths)
    ])


@MetricRegistry.register('stoi')
def stoi(x, y, fs=16000, batched=True, lengths=None):
    """Short-time objective intelligibility (x = estimate, y = clean)."""
    return _stoi(x, y, fs, False, batched, lengths)


@MetricRegistry.register('estoi')
def estoi(x, y, fs=16000, batched=True, lengths=None):
    """Extended STOI."""
    return _stoi(x, y, fs, True, batched, lengths)


@MetricRegistry.register('pesq')
@MetricRegistry.register('pesq_approx')
def pesq(x, y, fs=16000, mode='wb', normalized=False, batched=True,
         lengths=None):
    """PESQ MOS-LQO (x = estimate, y = clean reference).

    Scored by the in-repo ITU-T P.862/P.862.2 implementation
    (:mod:`brever_tpu.pesq` — the canonical C extension the reference
    binds, brever/metrics.py:47-99, is not installable here).

    .. warning:: This implementation follows the published P.862
       algorithm but is NOT bit-compatible with the ITU reference
       code: Bark band edges and absolute thresholds are analytic
       rather than the ITU tables, and time alignment (global +
       per-utterance delays) omits the bad-interval realignment
       refinement (see the deviation list in
       :mod:`brever_tpu.pesq`). Identical signals score the exact
       canonical maxima and scores rank degradations consistently
       (pinned by ``tests/test_metrics.py``), but absolute MOS-LQO
       values should not be compared against numbers produced by the
       canonical library. The metric is also registered as
       ``pesq_approx`` so results can be labelled explicitly; the
       ``pesq`` name is kept for reference CLI compatibility.

    ``batched=True`` runs items through a multiprocessing Pool like the
    reference's vendored ``pesq_batch`` (brever/metrics.py:153-213).
    ``normalized=True`` maps MOS-LQO onto [0, 1] using the published
    hard bounds (reference brever/metrics.py:71-93).
    """
    from . import pesq as pesq_mod

    x, y, lengths = _to_numpy(x), _to_numpy(y), _to_numpy(lengths)
    if batched:
        out = np.array(pesq_mod.pesq_batch(fs, y, x, mode=mode,
                                           lengths=lengths))
        if x.ndim == 1:
            out = out.item()
    elif x.ndim == 1:
        if lengths is not None:
            raise ValueError('Non-batched pesq does not support lengths '
                             'argument for 1D inputs.')
        out = pesq_mod.pesq(fs, y, x, mode=mode)
    else:
        if lengths is None:
            lengths = [x.shape[-1]] * x.shape[0]
        out = np.array([
            pesq_mod.pesq(fs, yi[:n], xi[:n], mode=mode)
            for xi, yi, n in zip(x, y, lengths)
        ])
    if normalized:
        bounds = {'nb': (1.0, 4.548638319075995),
                  'wb': (1.0, 4.643888749336258)}
        if mode not in bounds:
            raise ValueError(f"mode must be 'nb' or 'wb', got '{mode}'")
        lo, hi = bounds[mode]
        out = (out - lo) / (hi - lo)
        if np.any(np.asarray(out) < 0) or np.any(np.asarray(out) > 1):
            raise RuntimeError(
                f'normalized PESQ score is out of bounds: {out}')
    return out


def _check_input(x, y, lengths):
    import jax.numpy as jnp
    if x.shape != y.shape:
        raise ValueError(
            f'inputs must have same shape, got {x.shape} and {y.shape}')
    unbatched = x.ndim == 1
    if unbatched:
        x, y = x[None], y[None]
    if x.ndim != 2:
        raise ValueError(f'input must be 1 or 2 dimensional, got {x.ndim}')
    x, y = x[:, None], y[:, None]  # add source dimension
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[-1], dtype=jnp.int32)
    else:
        if len(lengths) != x.shape[0]:
            raise ValueError(
                'lengths must have same length as batch size, got '
                f'{len(lengths)} and {x.shape[0]}')
        if any(int(n) > x.shape[-1] for n in np.asarray(lengths)):
            raise ValueError(
                'lengths items must be smaller than input length, got '
                f'lengths={lengths} and input.shape={x.shape}')
        lengths = jnp.asarray(lengths)
    return jnp.asarray(x), jnp.asarray(y), lengths, unbatched


@MetricRegistry.register('snr')
def snr(x, y, lengths=None):
    x, y, lengths, unbatched = _check_input(x, y, lengths)
    out = -CriterionRegistry.get('snr')(x, y, lengths)
    return float(out[0]) if unbatched else out


@MetricRegistry.register('sisnr')
def sisnr(x, y, lengths=None):
    x, y, lengths, unbatched = _check_input(x, y, lengths)
    out = -CriterionRegistry.get('sisnr')(x, y, lengths)
    return float(out[0]) if unbatched else out
