"""Synthetic speech corpus generator (extension over the reference).

Creates a small on-disk corpus of speech-like signals (amplitude-
modulated harmonic tones with formant-ish filtering and pauses) in the
layout ``<root>/<speaker>/<utterance>.wav``, loadable through the
``synth`` corpus alias. Paired with the ``synthetic_*`` rooms and
colored/decay noise, this makes every pipeline stage runnable with zero
external databases — used by the test-suite and the CPU-runnable
example configs.
"""

import os

import numpy as np

from ..audio import write_wav


def _speech_like(rng, n, fs):
    """Harmonic source + slow AM envelope + random formant resonances."""
    t = np.arange(n) / fs
    f0 = rng.uniform(90, 250)
    source = sum(
        rng.uniform(0.3, 1.0) / (k + 1) * np.sin(2 * np.pi * f0 * (k + 1) * t)
        for k in range(8)
    )
    # syllabic envelope ~4 Hz with pauses
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t
                            + rng.uniform(0, 2 * np.pi)))
    gate = (np.sin(2 * np.pi * rng.uniform(0.3, 0.8) * t
                   + rng.uniform(0, 2 * np.pi)) > -0.7).astype(float)
    x = source * env**1.5 * gate
    # light noise floor so silence is not digital zero
    x = x + 1e-4 * rng.randn(n)
    x = x / np.abs(x).max() * 0.5
    return x.astype('float32')


def make_synthetic_speech_corpus(root, n_speakers=3, files_per_speaker=5,
                                 fs=16000, duration_range=(1.0, 3.0),
                                 seed=0):
    """Write a synthetic corpus; returns the root path.

    Deterministic in ``seed``; speakers are named ``spk00``, ``spk01``…
    """
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for s in range(n_speakers):
        speaker_dir = os.path.join(root, f'spk{s:02d}')
        os.makedirs(speaker_dir, exist_ok=True)
        for u in range(files_per_speaker):
            n = int(rng.uniform(*duration_range) * fs)
            x = _speech_like(rng, n, fs)
            write_wav(os.path.join(speaker_dir, f'utt{u:03d}.wav'), x, fs)
    return root
