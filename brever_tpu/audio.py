"""Audio file IO: a dependency-free RIFF/WAV codec + optional FLAC.

The reference stores datasets as FLAC via ``soundfile`` (libsndfile,
reference scripts/create_dataset.py:56-73). That library is not
available in this environment, so both formats are implemented
directly over numpy: a RIFF/WAV codec (PCM16/PCM24/PCM32/FLOAT) and a
FLAC codec (:mod:`brever_tpu.flac` — full decoder, 16-bit encoder), so
reference-created FLAC datasets load without any third-party
dependency and datasets created here can be written as FLAC like the
reference's. ``soundfile`` is still preferred when importable.
"""

import io
import os
import struct

import numpy as np

try:  # optional: enables .flac datasets created by the reference
    import soundfile as _sf
except ImportError:
    _sf = None

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class AudioInfo:
    """Minimal soundfile.info-like record."""

    def __init__(self, frames, channels, samplerate):
        self.frames = frames
        self.channels = channels
        self.samplerate = samplerate

    def __repr__(self):
        return (f'AudioInfo(frames={self.frames}, '
                f'channels={self.channels}, samplerate={self.samplerate})')


def _parse_wav_header(f):
    """Parse RIFF chunks up to 'data'; returns (fmt dict, data_offset,
    data_size)."""
    head = f.read(12)
    if len(head) < 12:
        raise ValueError('truncated WAV header')
    riff, _, wave = struct.unpack('<4sI4s', head)
    if riff != b'RIFF' or wave != b'WAVE':
        raise ValueError('not a RIFF/WAVE file')
    fmt = None
    while True:
        header = f.read(8)
        if len(header) < 8:
            raise ValueError('no data chunk found in WAV file')
        chunk_id, size = struct.unpack('<4sI', header)
        if chunk_id == b'fmt ':
            payload = f.read(size)
            if len(payload) < 16:
                raise ValueError('truncated WAV fmt chunk')
            (tag, channels, samplerate, _, block_align, bits) = \
                struct.unpack('<HHIIHH', payload[:16])
            if tag == _WAVE_FORMAT_EXTENSIBLE and size >= 40:
                tag = struct.unpack('<H', payload[24:26])[0]
            fmt = dict(tag=tag, channels=channels, samplerate=samplerate,
                       block_align=block_align, bits=bits)
            if size % 2:
                f.read(1)
        elif chunk_id == b'data':
            if fmt is None:
                raise ValueError('data chunk before fmt chunk')
            return fmt, f.tell(), size
        else:
            f.seek(size + (size % 2), io.SEEK_CUR)


def _decode_pcm(raw, fmt):
    bits, tag = fmt['bits'], fmt['tag']
    if tag == _WAVE_FORMAT_IEEE_FLOAT:
        data = np.frombuffer(raw, '<f4').astype(np.float32)
    elif tag == _WAVE_FORMAT_PCM and bits == 16:
        data = np.frombuffer(raw, '<i2').astype(np.float32) / 32768.0
    elif tag == _WAVE_FORMAT_PCM and bits == 32:
        data = np.frombuffer(raw, '<i4').astype(np.float32) / 2147483648.0
    elif tag == _WAVE_FORMAT_PCM and bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f'unsupported WAV format: tag={tag} bits={bits}')
    return data.reshape(-1, fmt['channels'])


def _open(file, mode='rb'):
    if isinstance(file, (str, os.PathLike)):
        return open(file, mode), True
    return file, False


def wav_info(file):
    f, owned = _open(file)
    try:
        fmt, _, data_size = _parse_wav_header(f)
        frames = data_size // fmt['block_align']
        return AudioInfo(frames, fmt['channels'], fmt['samplerate'])
    finally:
        if owned:
            f.close()


def read_wav(file, start=0, frames=-1, always_2d=False):
    """Read a WAV file (path or binary file object) as float32.

    Returns ``(data, samplerate)`` with data shape ``(n,)`` for mono or
    ``(n, channels)`` otherwise (soundfile convention).
    """
    f, owned = _open(file)
    try:
        fmt, offset, data_size = _parse_wav_header(f)
        block = fmt['block_align']
        total = data_size // block
        if frames < 0:
            frames = total - start
        frames = max(min(frames, total - start), 0)
        f.seek(offset + start * block)
        raw = f.read(frames * block)
        data = _decode_pcm(raw, fmt)
        if fmt['channels'] == 1 and not always_2d:
            data = data[:, 0]
        return data, fmt['samplerate']
    finally:
        if owned:
            f.close()


def write_wav(file, data, samplerate, subtype='FLOAT'):
    """Write float data to a WAV file (path or binary file object).

    ``subtype``: ``'FLOAT'`` (32-bit IEEE, lossless for float32 pipelines)
    or ``'PCM_16'``.
    """
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    channels = data.shape[1]

    if subtype == 'FLOAT':
        payload = data.astype('<f4').tobytes()
        tag, bits = _WAVE_FORMAT_IEEE_FLOAT, 32
    elif subtype == 'PCM_16':
        clipped = np.clip(data, -1.0, 1.0 - 1.0 / 32768)
        payload = (clipped * 32768.0).astype('<i2').tobytes()
        tag, bits = _WAVE_FORMAT_PCM, 16
    else:
        raise ValueError(f'unsupported subtype: {subtype}')

    block_align = channels * bits // 8
    byte_rate = samplerate * block_align
    header = struct.pack(
        '<4sI4s4sIHHIIHH4sI',
        b'RIFF', 36 + len(payload), b'WAVE',
        b'fmt ', 16, tag, channels, int(samplerate), int(byte_rate),
        block_align, bits,
        b'data', len(payload),
    )
    f, owned = _open(file, 'wb')
    try:
        f.write(header)
        f.write(payload)
    finally:
        if owned:
            f.close()


def read_audio(file, name=None, always_2d=False):
    """Read WAV natively or any soundfile-supported format when available.

    ``name`` gives the filename when ``file`` is a file object (for
    extension dispatch).
    """
    ext = _extension(file, name)
    if ext == '.wav':
        return read_wav(file, always_2d=always_2d)
    if _sf is not None:
        data, fs = _sf.read(file, dtype='float32', always_2d=always_2d)
        return data, fs
    if ext == '.flac':
        return read_flac(file, always_2d=always_2d)
    raise RuntimeError(
        f"cannot read '{ext}' audio: only .wav and .flac are supported "
        "without the soundfile library"
    )


def write_audio(file, data, samplerate, name=None, subtype=None):
    ext = _extension(file, name)
    if ext == '.wav':
        write_wav(file, data, samplerate, subtype=subtype or 'FLOAT')
        return
    if _sf is not None:
        _sf.write(file, data, samplerate)
        return
    if ext == '.flac':
        write_flac(file, data, samplerate)
        return
    raise RuntimeError(
        f"cannot write '{ext}' audio: only .wav and .flac are supported "
        "without the soundfile library"
    )


def audio_info(file, name=None):
    ext = _extension(file, name)
    if ext == '.wav':
        return wav_info(file)
    if _sf is not None:
        info = _sf.info(file)
        return AudioInfo(info.frames, info.channels, info.samplerate)
    if ext == '.flac':
        return flac_info(file)
    raise RuntimeError(
        f"cannot inspect '{ext}' audio: only .wav and .flac are "
        "supported without the soundfile library"
    )


def read_flac(file, always_2d=False):
    """Decode a FLAC file to float32 in [-1, 1) (soundfile semantics)."""
    from . import flac
    if isinstance(file, (str, os.PathLike)):
        with open(file, 'rb') as f:
            buf = f.read()
    else:
        buf = file.read()
    samples, info = flac.decode(buf)
    scale = float(1 << (info['bps'] - 1))
    data = samples.astype(np.float32) / scale
    if data.shape[1] == 1 and not always_2d:
        data = data[:, 0]
    return data, info['sample_rate']


def write_flac(file, data, samplerate):
    """Encode float or int16 samples as a 16-bit FLAC file."""
    from . import flac
    data = np.asarray(data)
    if data.dtype.kind == 'f':
        data = np.clip(np.round(data * 32768.0), -32768, 32767) \
            .astype(np.int16)
    buf = flac.encode(data, int(samplerate))
    if isinstance(file, (str, os.PathLike)):
        with open(file, 'wb') as f:
            f.write(buf)
    else:
        file.write(buf)


def flac_info(file):
    from . import flac

    def read_prefix(n):
        if isinstance(file, (str, os.PathLike)):
            with open(file, 'rb') as f:
                return f.read(n)
        pos = file.tell()
        buf = file.read(n)
        file.seek(pos)
        return buf

    # the metadata chain (PADDING/pictures/...) can extend past any
    # fixed prefix; retry with a growing window until the STREAMINFO
    # parse no longer runs off the end of the buffer
    n = 64 * 1024
    while True:
        buf = read_prefix(n)
        try:
            info, _ = flac.parse_header(buf)
            break
        except flac.FlacError as e:
            if 'truncated' in str(e) and len(buf) == n:
                n *= 4
                continue
            raise
    return AudioInfo(info['total_samples'], info['channels'],
                     info['sample_rate'])


def _extension(file, name):
    if name is None:
        if isinstance(file, (str, os.PathLike)):
            name = os.fspath(file)
        else:
            name = getattr(file, 'name', '')
    return os.path.splitext(str(name))[1].lower()
