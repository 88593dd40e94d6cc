"""FLAC codec: round trips, python-vs-native cross-check, format
features (LPC, channel decorrelation, wasted bits), dataset pipeline
(reference stores FLAC tars: scripts/create_dataset.py:56-73)."""

import io
import struct
import tarfile

import numpy as np
import pytest
import scipy.signal

from brever_tpu import flac
from brever_tpu.audio import audio_info, read_audio, write_audio


def _speechish(n, channels=2, seed=0, scale=3000):
    rng = np.random.RandomState(seed)
    x = scipy.signal.lfilter([1], [1, -0.9], rng.randn(n, channels),
                             axis=0) * scale
    return x.astype(np.int16)


def test_round_trip_exact():
    x = _speechish(30000)
    enc = flac.encode(x, 16000)
    dec, info = flac.decode(enc)
    np.testing.assert_array_equal(dec, x.astype(np.int32))
    assert info['sample_rate'] == 16000
    assert info['channels'] == 2
    assert info['total_samples'] == 30000


def test_compression_on_predictable_signal():
    """LPC/fixed prediction must actually compress tonal content."""
    t = np.arange(40000)
    x = (8000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)
    enc = flac.encode(x, 16000)
    assert len(enc) < 0.5 * x.nbytes


def test_odd_tail_and_constant_blocks():
    y = np.zeros(5000, np.int16)
    y[:777] = (np.sin(np.arange(777) * 0.1) * 5000).astype(np.int16)
    enc = flac.encode(y, 8000)
    dec, info = flac.decode(enc)
    np.testing.assert_array_equal(dec[:, 0], y.astype(np.int32))
    assert info['total_samples'] == 5000


def test_decode_max_frames():
    x = _speechish(20000)
    enc = flac.encode(x, 16000)
    dec, _ = flac.decode(enc, max_frames=4097)
    np.testing.assert_array_equal(dec, x[:4097].astype(np.int32))


def test_native_decoder_matches_python():
    from brever_tpu import native
    if not native.available():
        pytest.skip('native library not built')
    x = _speechish(30000, seed=3)
    enc = flac.encode(x, 16000)
    out, n, sr = native.decode_wav(enc, 40000)
    assert n == 30000 and sr == 16000
    np.testing.assert_allclose(
        out[:, :n].T, x.astype(np.float32) / 32768.0, atol=1e-7)


def _handmade_stereo_frame(left, right, ch_code):
    """Build a single-frame FLAC stream with a left/side, right/side or
    mid/side channel assignment (our encoder only emits independent
    channels; this covers the decode paths reference-encoded files
    use)."""
    blocksize = len(left)
    if ch_code == 8:        # left/side
        subs = [(left, 16), (left - right, 17)]
    elif ch_code == 9:      # right/side
        subs = [(left - right, 17), (right, 16)]
    else:                   # mid/side
        subs = [((left + right) >> 1, 16), (left - right, 17)]

    w = flac._BitWriter()
    w.write_uint(0x3FFE, 14)
    w.write_uint(0, 2)
    w.write_uint(7, 4)           # 16-bit blocksize-1 follows
    w.write_uint(0, 4)
    w.write_uint(ch_code, 4)
    w.write_uint(4, 3)           # 16 bps
    w.write_uint(0, 1)
    w.write_uint(0, 8)           # frame number 0 (utf8)
    w.write_uint(blocksize - 1, 16)
    w.write_uint(flac._crc8(bytes(w.out)), 8)
    for data, bps in subs:
        flac._encode_subframe(w, data.astype(np.int64), bps)
    w.align()
    frame = bytearray(w.getvalue())
    frame += struct.pack('>H', flac._crc16(frame))

    streaminfo = bytearray()
    streaminfo += struct.pack('>HH', blocksize, blocksize)
    streaminfo += b'\x00' * 6
    packed = (16000 << 44) | (1 << 41) | (15 << 36) | blocksize
    streaminfo += packed.to_bytes(8, 'big')
    streaminfo += b'\x00' * 16
    out = bytearray(b'fLaC')
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, 'big')
    out += streaminfo + frame
    return bytes(out)


@pytest.mark.parametrize('ch_code', [8, 9, 10])
def test_channel_decorrelation_decode(ch_code):
    rng = np.random.RandomState(4)
    left = rng.randint(-2000, 2000, 4096).astype(np.int64)
    right = (left * 0.8).astype(np.int64) + rng.randint(-50, 50, 4096)
    buf = _handmade_stereo_frame(left, right, ch_code)
    dec, _ = flac.decode(buf)
    np.testing.assert_array_equal(dec[:, 0], left)
    np.testing.assert_array_equal(dec[:, 1], right)
    from brever_tpu import native
    if native.available():
        out, n, _ = native.decode_wav(buf, 4096)
        assert n == 4096
        np.testing.assert_allclose(out[0], left / 32768.0, atol=1e-7)
        np.testing.assert_allclose(out[1], right / 32768.0, atol=1e-7)


def test_truncated_header_raises_flacerror():
    x = _speechish(4000)
    enc = bytes(flac.encode(x, 16000))
    for cut in (5, 7, 20):
        with pytest.raises(flac.FlacError):
            flac.parse_header(enc[:cut])


def _with_padding_block(enc, pad_len):
    """Insert a PADDING metadata block after STREAMINFO."""
    _, first_frame = flac.parse_header(enc)
    head = bytearray(enc[:first_frame])
    head[4] &= 0x7F  # STREAMINFO is no longer the last block
    pad = bytes([0x81]) + pad_len.to_bytes(3, 'big') + bytes(pad_len)
    return bytes(head) + pad + enc[first_frame:]


def test_flac_info_large_metadata(tmp_path):
    """flac_info must survive a metadata chain longer than its initial
    64 KB prefix read (ADVICE r2: large PADDING/picture blocks)."""
    x = _speechish(2000)
    enc = _with_padding_block(bytes(flac.encode(x, 16000)), 200_000)
    dec, info = flac.decode(enc)
    np.testing.assert_array_equal(dec, x.astype(np.int32))
    path = tmp_path / 'padded.flac'
    path.write_bytes(enc)
    got = audio_info(str(path))
    assert got.frames == 2000
    assert got.channels == 2
    assert got.samplerate == 16000


def test_audio_dispatch_flac(tmp_path):
    """read/write/info through the audio.py extension dispatch."""
    x = _speechish(12000).astype(np.float32) / 32768.0
    path = str(tmp_path / 'test.flac')
    write_audio(path, x, 16000)
    info = audio_info(path)
    assert (info.frames, info.channels, info.samplerate) \
        == (12000, 2, 16000)
    data, fs = read_audio(path)
    assert fs == 16000
    np.testing.assert_allclose(data, x, atol=1.0 / 32767)


def test_flac_dataset_pipeline(tmp_path):
    """BreverDataset over a FLAC tar (the reference's storage format),
    through both the python and (if built) the native loader."""
    from brever_tpu.batching import SortedBatchSampler
    from brever_tpu.data import BreverDataLoader, BreverDataset

    rng = np.random.RandomState(5)
    n_items = 4
    fs = 16000
    lengths = [8000, 9000, 7000, 8500]
    dset = tmp_path / 'dset'
    dset.mkdir()
    with tarfile.open(dset / 'audio.tar', 'w') as tar:
        for i, n in enumerate(lengths):
            for source in ('mixture', 'foreground'):
                x = (rng.randn(n, 2) * 0.1).astype(np.float32)
                buf = io.BytesIO()
                write_audio(buf, x, fs, name='x.flac')
                data = buf.getvalue()
                info = tarfile.TarInfo(f'audio/{i:05d}_{source}.flac')
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

    ds = BreverDataset(path=str(dset), segment_length=0.0)
    assert len(ds) == n_items
    item = ds[0]
    assert item[0].shape[-1] == lengths[0]

    sampler = SortedBatchSampler(ds, batch_size=2, shuffle=False)
    for native_flag in (False, True):
        loader = BreverDataLoader(ds, sampler, native=native_flag)
        if native_flag and not loader.native:
            continue  # native lib not built
        batches = list(loader)
        total = sum(b.shape[0] for b, _ in batches)
        assert total == n_items
        for b, ln in batches:
            assert np.isfinite(b).all()
            assert b.shape[1] == 2 and b.shape[2] == 2


def test_truncation_fuzz_never_raises_bare_errors():
    """Cutting the stream at ANY point must surface FlacError (never
    IndexError/struct.error/KeyError): callers catch codec errors."""
    x = _speechish(4000)
    enc = bytes(flac.encode(x, 16000))
    cuts = list(range(1, 60, 3)) + list(
        np.linspace(60, len(enc) - 1, 40, dtype=int))
    for cut in cuts:
        try:
            flac.decode(enc[:cut])
        except flac.FlacError:
            pass


def test_integrate_fixed_matches_recurrence():
    """The vectorized FIXED-predictor inversion (nested cumsums) must
    reproduce the per-sample recurrence for every order, including
    orders 3/4 that this repo's encoder never emits (foreign encoders
    do)."""
    rng = np.random.RandomState(7)
    for order in range(5):
        blocksize = 257
        warmup = rng.randint(-30000, 30000, order).astype(np.int64)
        res = rng.randint(-4000, 4000, blocksize - order).astype(np.int64)
        coefs = flac._FIXED_COEFS[order]
        want = np.empty(blocksize, np.int64)
        want[:order] = warmup
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * want[i - 1 - j]
            want[i] = res[i - order] + pred
        got = flac._integrate_fixed(warmup, res, order)
        np.testing.assert_array_equal(got, want), order
