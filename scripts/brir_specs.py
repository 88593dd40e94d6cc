"""Print BRIR database statistics: rooms, angle counts, estimated RT60
and DRR per room (reference scripts/brir_specs.py role)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.mixture.dsp import split_brir  # noqa: E402
from brever_tpu.mixture.io import AudioFileLoader  # noqa: E402
from brever_tpu.utils import pretty_table  # noqa: E402


def estimate_rt60(brir, fs):
    """Schroeder backward integration, -5 to -35 dB slope x2."""
    energy = brir.mean(axis=1)**2
    edc = np.cumsum(energy[::-1])[::-1]
    edc_db = 10 * np.log10(edc / edc.max() + 1e-12)
    try:
        i5 = np.where(edc_db <= -5)[0][0]
        i35 = np.where(edc_db <= -35)[0][0]
    except IndexError:
        return float('nan')
    return 2 * (i35 - i5) / fs


def estimate_drr(brir, fs):
    early, late = split_brir(brir, fs=fs)
    e_early = np.sum(early.mean(axis=1)**2)
    e_late = np.sum(late.mean(axis=1)**2)
    return 10 * np.log10(e_early / (e_late + 1e-12))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('rooms', nargs='+',
                        help="room regexps, e.g. 'surrey_.*'")
    parser.add_argument('--fs', type=int, default=16000)
    args = parser.parse_args()

    loader = AudioFileLoader(fs=args.fs)
    rows = {}
    for regexp in args.rooms:
        for room in sorted(loader.get_rooms(regexp)):
            angles = loader.get_angles(room)
            brir, _ = loader.load_brirs(room, angles[len(angles) // 2])
            rows[room] = {
                'angles': len(angles),
                'length_s': round(len(brir) / args.fs, 3),
                'rt60_s': round(estimate_rt60(brir, args.fs), 3),
                'drr_dB': round(estimate_drr(brir, args.fs), 1),
            }
    if rows:
        pretty_table(rows, key_header='room')


if __name__ == '__main__':
    main()
