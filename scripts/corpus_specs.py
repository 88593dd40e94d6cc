"""Print statistics of installed speech/noise corpora: speaker counts,
file counts, durations (reference scripts/corpus_specs.py role)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.mixture.io import AudioFileLoader  # noqa: E402
from brever_tpu.utils import pretty_table  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--speakers', nargs='*', default=[],
                        help="speech corpora, e.g. 'libri_.*'")
    parser.add_argument('--noises', nargs='*', default=[],
                        help="noise corpora, e.g. 'dcase_.*'")
    parser.add_argument('--durations', action='store_true',
                        help='also compute durations (reads every file)')
    args = parser.parse_args()

    loader = AudioFileLoader()
    rows = {}
    for speaker in args.speakers:
        prefix = speaker.split('_')[0]
        speakers = loader.get_speakers(prefix)
        files = loader.get_speech_files(speaker)
        row = {'speakers': len(speakers), 'files': len(files)}
        if args.durations:
            duration, _ = loader.get_duration(speaker)
            row['duration_h'] = round(duration / 3600, 2)
        rows[speaker] = row
    for noise in args.noises:
        files = loader.get_noise_files(noise)
        rows[noise] = {'speakers': '-', 'files': len(files)}
        if args.durations:
            rows[noise]['duration_h'] = '-'
    if rows:
        pretty_table(rows, key_header='corpus')


if __name__ == '__main__':
    main()
