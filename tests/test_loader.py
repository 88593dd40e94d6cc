"""External-database integrity checks (reference tests/test_loader.py:
23-175): pinned speaker/file/angle counts per corpus, skipped when a
database is not installed. This is the "is your data installed
correctly" surface — in DB-less environments every test here skips,
but installed corpora are verified against the exact reference
inventory."""

import os

import pytest

from brever_tpu.mixture.io import AudioFileLoader

PATHS_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'config', 'paths.yaml')


@pytest.fixture(scope='module')
def loader():
    if not os.path.exists(PATHS_FILE):
        pytest.skip('config/paths.yaml not found')
    return AudioFileLoader(16000, paths_file=PATHS_FILE)


def _skip_if_absent(loader, prefix):
    try:
        dirpath = loader.get_path(prefix, raise_=False)
    except Exception:
        pytest.skip(f'{prefix} alias not configured')
    if not dirpath or not os.path.exists(dirpath):
        pytest.skip(f'{prefix} database not installed')


@pytest.mark.parametrize('prefix, speaker_count', [
    ('timit', 630),
    ('libri', 251),
    ('wsj0', 131),
    ('clarity', 40),
    ('vctk', 110),
])
def test_speakers(loader, prefix, speaker_count):
    _skip_if_absent(loader, prefix)
    assert len(loader.get_speakers(prefix)) == speaker_count


@pytest.mark.parametrize('speaker, file_count', [
    ('timit_.*', 6300),
    ('libri_.*', 28539),
    ('wsj0_.*', 34738),
    ('clarity_.*', 11352),
    ('vctk_.*', 44454),
])
def test_speech_files(loader, speaker, file_count):
    prefix = speaker.split('_')[0]
    _skip_if_absent(loader, prefix)
    assert len(loader.get_speech_files(speaker)) == file_count


@pytest.mark.parametrize('prefix, suffixes', [
    ('dcase', ['airport', 'bus', 'metro', 'metro_station', 'park',
               'public_square', 'shopping_mall', 'street_pedestrian',
               'street_traffic', 'tram', '.*']),
    ('noisex', ['babble', 'buccaneer1', 'buccaneer2', 'destroyerengine',
                'destroyerops', 'f16', 'factory1', 'factory2',
                'hfchannel', 'leopard', 'm109', 'machinegun', 'pink',
                'volvo', 'white', '.*']),
    ('icra', ['01', '02', '03', '04', '05', '06', '07', '08', '09',
              '.*']),
    ('demand', []),
    ('arte', []),
])
def test_noise_files_resolve(loader, prefix, suffixes):
    _skip_if_absent(loader, prefix)
    if suffixes:
        for suffix in suffixes:
            assert loader.get_noise_files(f'{prefix}_{suffix}')
    else:
        assert loader.get_noise_files(prefix)


@pytest.mark.parametrize('room, angle_count', [
    ('surrey_room_a', 37),
    ('surrey_room_b', 37),
    ('surrey_room_c', 37),
    ('surrey_room_d', 37),
    ('ash_r01', 24),
    ('ash_r02', 24),
    ('ash_r03', 24),
    ('ash_r05b', 20),
    ('ash_r08', 9),
])
def test_brir_angles(loader, room, angle_count):
    prefix = room.split('_')[0]
    _skip_if_absent(loader, prefix)
    assert len(loader.get_angles(room)) == angle_count


@pytest.mark.parametrize('regexp, room_count', [
    ('surrey_.*', 4),
])
def test_room_inventory(loader, regexp, room_count):
    prefix = regexp.split('_')[0]
    _skip_if_absent(loader, prefix)
    assert len(loader.get_rooms(regexp)) == room_count
