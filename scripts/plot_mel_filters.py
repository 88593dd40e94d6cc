"""Plot the mel filterbank (reference scripts/plot_mel_filters.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.ops import MelFilterbank  # noqa: E402
from brever_tpu.utils import fft_freqs  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--n-filters', type=int, default=64)
    parser.add_argument('--n-fft', type=int, default=512)
    parser.add_argument('--fs', type=int, default=16000)
    parser.add_argument('--output', default='mel_filters.png')
    args = parser.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fb = MelFilterbank(n_filters=args.n_filters, n_fft=args.n_fft,
                       fs=args.fs)
    f = fft_freqs(args.fs, args.n_fft)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(f, np.asarray(fb.filters).T)
    ax.set_xlabel('frequency (Hz)')
    ax.set_ylabel('weight')
    ax.set_title(f'{args.n_filters} mel filters, n_fft={args.n_fft}')
    fig.tight_layout()
    fig.savefig(args.output)
    print(f'wrote {args.output}')


if __name__ == '__main__':
    main()
