"""Record mixture-metadata goldens by RUNNING the reference roller.

SURVEY §7 requires the seeding scheme to reproduce reference datasets
bit-for-bit (reference brever/mixture/random.py:48-107,
metadata.py:285-447). This script executes the reference's own
``MixtureMetadata`` (from a read-only checkout, path via
``--reference``) against a synthetic in-memory corpus and records the
rolled metadata dicts to a committed JSON golden;
``tests/test_reference_goldens.py`` then rolls this repo's
``MixtureMetadata`` against the identical corpus and asserts
dict-for-dict equality.

The reference's heavy IO deps (``soundfile``, ``sofa``) are stubbed:
metadata rolling only ever calls ``soundfile.info(path).frames``, which
the stub answers deterministically from the path (same rule the test
re-applies on this repo's ``audio_info``).

Usage:
    python scripts/record_reference_goldens.py \
        [--reference /root/reference] \
        [--out tests/goldens/reference_metadata_goldens.json]
"""

import argparse
import json
import os
import sys
import types
import zlib

#: deterministic fake audio length for a path (frames at 16 kHz)
FRAMES_SALT = 'brever-golden-v1'


def fake_frames(path):
    h = zlib.crc32((FRAMES_SALT + str(path)).encode())
    return 8000 + h % 160000


def build_pools():
    """Synthetic corpus pools, shared verbatim with the parity test
    (they are embedded in the golden JSON)."""

    def files(prefix, n, ext):
        return [f'{prefix}/{i:04d}.{ext}' for i in range(n)]

    speech = {}
    for k in range(4):
        speech[f'libri_sp{k:02d}'] = files(f'LibriSpeech/sp{k:02d}', 30,
                                           'flac')
    for k in range(3):
        speech[f'timit_m{k:02d}'] = files(f'TIMIT/m{k:02d}', 10, 'wav')
    # keyed by the noise SPEC string, the way AudioFileLoader
    # .scan_material populates _noise_files (reference io.py:169-250:
    # one entry per requested alias/regexp; colored_X maps to itself)
    noise = {
        'dcase_.*': files('DCASE/bus', 20, 'wav')
        + files('DCASE/park', 15, 'wav'),
        'noisex_.*': files('NOISEX/babble', 2, 'wav')
        + files('NOISEX/factory', 2, 'wav'),
        'colored_pink': ['colored_pink'],
        'colored_white': ['colored_white'],
    }
    rooms = {
        'surrey_anechoic': list(range(-90, 95, 5)),
        'surrey_room_a': list(range(-90, 95, 5)),
        'surrey_room_b': list(range(-90, 95, 15)),
        'ash_r01': list(range(-90, 95, 10)),
        'ash_r02': list(range(-90, 95, 10)),
    }
    room_regexps = {
        'surrey_.*': ['surrey_anechoic', 'surrey_room_a', 'surrey_room_b'],
        'ash_.*': ['ash_r01', 'ash_r02'],
    }
    weights = {k: 1.0 + zlib.crc32(k.encode()) % 100 / 50.0
               for k in speech}
    return {
        'speech_files': speech,
        'noise_files': noise,
        'room_angles': rooms,
        'room_regexps': room_regexps,
        'speaker_weights': weights,
    }


#: hyperparameter sets to roll (exercise every randomizer branch:
#: decay/diffuse toggles, parity filters, file limits, multi-corpus
#: weighted speakers, colored/ssn no-file noises, noise_num extremes)
CONFIGS = [
    dict(seed=0),
    dict(seed=42, decay=True, diffuse=True, diffuse_ltas_eq=True,
         uniform_tmr=True, decay_rt60_dist_args=(0.2, 1.0)),
    dict(seed=7, speakers={'libri_.*', 'timit_.*'},
         noises={'dcase_.*', 'noisex_.*'}, weight_by_avg_length=True,
         room_files='even', noise_num=(0, 4),
         target_snr_dist_args=(-10.0, 15.0)),
    dict(seed=3, noises={'colored_pink', 'colored_white'},
         speech_files=(0.2, 0.8), noise_files=(0.1, 0.9),
         rms_jitter_dist_args=(-3.0, 3.0)),
    dict(seed=99, rooms={'surrey_.*', 'ash_.*'}, room_files='odd',
         target_angle=(-45.0, 45.0), noise_angle=(-60.0, 60.0)),
]

N_ROLLS = 8


class FakeLoader:
    """Duck-typed stand-in for AudioFileLoader: only the attributes the
    metadata roller touches."""

    def __init__(self, pools):
        self._speech_files = pools['speech_files']
        self._noise_files = pools['noise_files']
        self._room_angles = pools['room_angles']
        self._room_regexps = pools['room_regexps']
        self._weights = pools['speaker_weights']

    def calc_weights(self, speakers):
        import re
        return {
            regexp: sum(w for k, w in self._weights.items()
                        if re.match(regexp, k))
            for regexp in speakers
        }


def _stub_modules():
    sf = types.ModuleType('soundfile')

    class _Info:
        def __init__(self, path):
            self.frames = fake_frames(path)
            self.samplerate = 16000

    sf.info = _Info
    sys.modules['soundfile'] = sf
    sys.modules['sofa'] = types.ModuleType('sofa')


def to_jsonable(obj):
    import numpy as np
    if isinstance(obj, dict):
        return {k: to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_jsonable(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--reference', default='/root/reference')
    parser.add_argument(
        '--out', default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'tests', 'goldens', 'reference_metadata_goldens.json'))
    args = parser.parse_args()

    _stub_modules()
    sys.path.insert(0, args.reference)
    from brever.mixture.metadata import MixtureMetadata

    pools = build_pools()
    out = {
        'frames_salt': FRAMES_SALT,
        'n_rolls': N_ROLLS,
        'pools': pools,
        'configs': [],
    }
    for kwargs in CONFIGS:
        meta = MixtureMetadata(FakeLoader(pools), **kwargs)
        rolls = []
        for _ in range(N_ROLLS):
            meta.roll()
            rolls.append(to_jsonable(meta.get()))
        record = {
            'kwargs': to_jsonable(
                {k: sorted(v) if isinstance(v, set) else v
                 for k, v in kwargs.items()}),
            'set_keys': sorted(k for k, v in kwargs.items()
                               if isinstance(v, set)),
            'tuple_keys': sorted(k for k, v in kwargs.items()
                                 if isinstance(v, tuple)),
            'rolls': rolls,
        }
        out['configs'].append(record)
        print(f"seed={kwargs['seed']}: {len(rolls)} rolls, first room "
              f"{rolls[0]['room']}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write('\n')
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
