"""Seed-for-seed metadata parity against reference-recorded goldens.

``tests/goldens/reference_metadata_goldens.json`` was produced by
RUNNING the reference's own ``MixtureMetadata`` roller
(``scripts/record_reference_goldens.py``; reference
brever/mixture/random.py:48-107, metadata.py:285-447) over a synthetic
in-memory corpus. This test rolls this repo's ``MixtureMetadata``
against the identical corpus and asserts dict-for-dict equality —
the bit-compatible-seeding contract of SURVEY §7.
"""

import json
import os
import zlib

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens',
                      'reference_metadata_goldens.json')


class _FakeLoader:
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


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


@pytest.fixture(scope='module')
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_metadata_matches_reference_rolls(golden, monkeypatch):
    import brever_tpu.mixture.metadata as meta_mod

    salt = golden['frames_salt']

    class _Info:
        def __init__(self, path):
            self.frames = 8000 + zlib.crc32(
                (salt + str(path)).encode()) % 160000
            self.samplerate = 16000

    monkeypatch.setattr(meta_mod, 'audio_info', _Info)

    loader = _FakeLoader(golden['pools'])
    for config in golden['configs']:
        kwargs = dict(config['kwargs'])
        for k in config['set_keys']:
            kwargs[k] = set(kwargs[k])
        for k in config['tuple_keys']:
            kwargs[k] = tuple(kwargs[k])
        meta = meta_mod.MixtureMetadata(loader, **kwargs)
        for i, expected in enumerate(config['rolls']):
            meta.roll()
            got = json.loads(json.dumps(_to_jsonable(meta.get())))
            assert got == expected, (
                f"seed={kwargs['seed']} roll {i}: metadata diverges "
                f'from the reference roll\n got: {got}\n exp: {expected}')
