"""Quantify the from-scratch PESQ's drift vs the canonical library.

The in-repo PESQ (``brever_tpu.pesq``) is a from-scratch P.862 /
P.862.2 implementation with documented deviations (analytic Bark
tables, no bad-interval realignment — see the module docstring). This
script turns the resulting "approximately canonical" claim into a
one-command measurement: it scores a fixed matrix of degradations
(additive noise over an SNR sweep, lowpass filtering, clipping, level
offsets, constant delays) with both implementations and reports the
per-case and maximum |ΔMOS-LQO|.

The canonical implementation is the ``pesq`` PyPI package (the ITU
reference C code — what the reference repo uses,
reference brever/metrics.py:9-16). It does not build in this repo's
environment; run this script on any host where ``pip install pesq``
works:

    python scripts/check_pesq_parity.py --mode wb --out parity.json

Without the canonical library the script still runs, prints this
implementation's score table and writes it to ``--out`` (useful as a
drift record); the delta columns are then null.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')

from brever_tpu.pesq import pesq as pesq_local  # noqa: E402

try:
    from pesq import pesq as pesq_canonical
except ImportError:
    pesq_canonical = None


def make_speech_like(fs, seconds, seed):
    """Synthetic speech-like signal: pitch-modulated harmonics with
    syllabic (4 Hz) energy modulation and silences, band-limited to
    the telephony band. Deterministic per seed."""
    rng = np.random.RandomState(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    for k in range(1, 12):
        amp = 1.0 / k * (0.5 + 0.5 * np.sin(
            2 * np.pi * rng.uniform(0.3, 1.2) * t + rng.uniform(0, 6)))
        x += amp * np.sin(k * phase + rng.uniform(0, 6))
    # syllabic gating with pauses
    envelope = np.clip(np.sin(2 * np.pi * 4.0 * t + rng.uniform(0, 6)),
                       0.0, None) ** 0.5
    gate = (np.sin(2 * np.pi * 0.9 * t + rng.uniform(0, 6)) > -0.4)
    x *= envelope * gate
    x /= np.max(np.abs(x)) + 1e-12
    return (x * 0.3).astype(np.float32)


def degradations(ref, fs, rng):
    """Yield (name, degraded) pairs covering the distortion classes
    P.862 was calibrated on (additive noise, bandwidth loss,
    waveform distortion, level and delay errors)."""
    noise = rng.randn(ref.size).astype(np.float32)
    noise /= np.sqrt(np.mean(noise ** 2))
    sig_rms = np.sqrt(np.mean(ref ** 2))
    for snr in (40, 30, 20, 10, 5, 0):
        yield f'awgn_{snr}dB', ref + noise * sig_rms * 10 ** (-snr / 20)
    # lowpass: zero all rFFT bins above fc
    for fc in (3400, 2000, 1000):
        spec = np.fft.rfft(ref)
        freqs = np.fft.rfftfreq(ref.size, 1 / fs)
        spec[freqs > fc] = 0
        yield f'lowpass_{fc}Hz', np.fft.irfft(spec, ref.size).astype(
            np.float32)
    for clip in (0.5, 0.2):
        peak = np.max(np.abs(ref))
        yield f'clip_{clip}', np.clip(ref, -clip * peak, clip * peak)
    for gain_db in (-20, 12):
        yield f'gain_{gain_db}dB', ref * 10 ** (gain_db / 20)
    for delay_ms in (8, 32):
        d = int(fs * delay_ms / 1000)
        yield f'delay_{delay_ms}ms', np.concatenate(
            [np.zeros(d, np.float32), ref[:-d]])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--mode', default='wb', choices=['nb', 'wb'])
    ap.add_argument('--seconds', type=float, default=6.0)
    ap.add_argument('--seeds', type=int, default=3)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    fs = 16000 if args.mode == 'wb' else 8000
    rows = []
    for seed in range(args.seeds):
        ref = make_speech_like(fs, args.seconds, seed)
        rng = np.random.RandomState(1000 + seed)
        for name, deg in degradations(ref, fs, rng):
            local = float(pesq_local(fs, ref, deg, mode=args.mode))
            if pesq_canonical is not None:
                canon = float(pesq_canonical(fs, ref, deg, args.mode))
                delta = local - canon
            else:
                canon = delta = None
            rows.append({'seed': seed, 'case': name, 'local': local,
                         'canonical': canon, 'delta': delta})

    width = max(len(r['case']) for r in rows)
    print(f'{"case":<{width}}  seed  {"local":>7}  {"canonical":>9}  '
          f'{"delta":>7}')
    for r in rows:
        canon = f'{r["canonical"]:9.3f}' if r['canonical'] is not None \
            else '        —'
        delta = f'{r["delta"]:+7.3f}' if r['delta'] is not None else '      —'
        print(f'{r["case"]:<{width}}  {r["seed"]:>4}  {r["local"]:7.3f}  '
              f'{canon}  {delta}')

    summary = {'mode': args.mode, 'n_cases': len(rows), 'rows': rows}
    if pesq_canonical is not None:
        deltas = np.array([r['delta'] for r in rows])
        summary['max_abs_delta'] = float(np.max(np.abs(deltas)))
        summary['mean_abs_delta'] = float(np.mean(np.abs(deltas)))
        # rank agreement matters more than absolute agreement for a
        # validation metric: does "better" mean the same thing?
        local = np.array([r['local'] for r in rows])
        canon = np.array([r['canonical'] for r in rows])
        summary['rank_correlation'] = float(np.corrcoef(
            np.argsort(np.argsort(local)),
            np.argsort(np.argsort(canon)))[0, 1])
        print(f'\nmax |ΔMOS| = {summary["max_abs_delta"]:.3f}   '
              f'mean |ΔMOS| = {summary["mean_abs_delta"]:.3f}   '
              f'rank corr = {summary["rank_correlation"]:.4f}')
    else:
        print('\ncanonical pesq not importable on this host — install '
              '`pesq` (pip) and re-run to measure the parity bound')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(summary, f, indent=1)
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
