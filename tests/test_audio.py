"""Native WAV codec round trips and info."""

import io

import numpy as np
import pytest

from brever_tpu.audio import (
    audio_info,
    read_audio,
    read_wav,
    wav_info,
    write_wav,
)


@pytest.mark.parametrize('channels', [1, 2])
@pytest.mark.parametrize('subtype', ['FLOAT', 'PCM_16'])
def test_wav_round_trip(tmp_path, channels, subtype):
    rng = np.random.RandomState(0)
    x = (0.8 * rng.randn(1000, channels).clip(-1, 1)).astype('float32')
    if channels == 1:
        x = x[:, 0]
    path = tmp_path / 'test.wav'
    write_wav(path, x, 16000, subtype=subtype)
    y, fs = read_wav(path)
    assert fs == 16000
    assert y.shape == x.shape
    atol = 1e-7 if subtype == 'FLOAT' else 1e-4
    np.testing.assert_allclose(y, x, atol=atol)


def test_wav_file_object():
    x = np.random.RandomState(1).randn(500).astype('float32')
    buf = io.BytesIO()
    write_wav(buf, x, 8000)
    buf.seek(0)
    y, fs = read_wav(buf)
    np.testing.assert_allclose(y, x, atol=1e-7)
    assert fs == 8000


def test_wav_info(tmp_path):
    x = np.zeros((1234, 2), dtype='float32')
    path = tmp_path / 'info.wav'
    write_wav(path, x, 44100)
    info = wav_info(path)
    assert info.frames == 1234
    assert info.channels == 2
    assert info.samplerate == 44100
    assert audio_info(str(path)).frames == 1234


def test_wav_partial_read(tmp_path):
    x = np.arange(100, dtype='float32') / 200
    path = tmp_path / 'partial.wav'
    write_wav(path, x, 16000)
    y, _ = read_wav(path, start=10, frames=20)
    np.testing.assert_allclose(y, x[10:30], atol=1e-7)


def test_read_audio_dispatch(tmp_path):
    x = np.random.RandomState(2).randn(300).astype('float32')
    path = tmp_path / 'a.wav'
    write_wav(path, x, 16000)
    y, fs = read_audio(str(path))
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_unsupported_format_raises(tmp_path):
    try:
        import soundfile  # noqa: F401
        pytest.skip('soundfile available; all formats supported')
    except ImportError:
        pass
    path = tmp_path / 'a.ogg'
    path.write_bytes(b'not audio')
    with pytest.raises(RuntimeError, match='soundfile'):
        read_audio(str(path))


def test_bad_wav_raises(tmp_path):
    path = tmp_path / 'bad.wav'
    path.write_bytes(b'RIFFxxxxNOPE')
    with pytest.raises(ValueError):
        wav_info(str(path))


def test_always_2d(tmp_path):
    x = np.zeros(100, dtype='float32')
    path = tmp_path / 'mono.wav'
    write_wav(path, x, 16000)
    y, _ = read_wav(path, always_2d=True)
    assert y.shape == (100, 1)


def test_wav_truncation_fuzz(tmp_path):
    """Truncated WAVs must raise ValueError, not unpack/index errors."""
    import io as _io

    from brever_tpu.audio import read_wav, write_wav

    buf = _io.BytesIO()
    x = np.random.RandomState(0).randn(500, 2).astype('float32')
    write_wav(buf, x, 16000)
    raw = buf.getvalue()
    for cut in list(range(1, 44, 4)) + [50, 100, len(raw) // 2]:
        try:
            read_wav(_io.BytesIO(raw[:cut]))
        except (ValueError, EOFError):
            pass
