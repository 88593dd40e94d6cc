"""Native C++ runtime: WAV decode and parallel tar batch loading."""

import io
import os
import tarfile

import numpy as np
import pytest

from brever_tpu import native
from brever_tpu.audio import write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native toolchain unavailable')


def test_native_decode_wav():
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(1000, 2)).astype('float32')
    buf = io.BytesIO()
    write_wav(buf, x, 16000)
    out, n, fs = native.decode_wav(buf.getvalue(), 1200)
    assert n == 1000 and fs == 16000
    np.testing.assert_allclose(out[:, :1000].T, x, atol=1e-7)
    assert np.all(out[:, 1000:] == 0)


def test_native_decode_pcm16():
    rng = np.random.RandomState(1)
    x = (0.5 * rng.randn(500, 2)).astype('float32')
    buf = io.BytesIO()
    write_wav(buf, x, 8000, subtype='PCM_16')
    out, n, fs = native.decode_wav(buf.getvalue(), 500)
    assert n == 500 and fs == 8000
    clipped = np.clip(x, -1.0, 1.0 - 1.0 / 32768)
    np.testing.assert_allclose(out.T, clipped, atol=1e-4)


def test_native_tar_batch(tmp_path):
    rng = np.random.RandomState(2)
    tar_path = str(tmp_path / 'audio.tar')
    signals = []
    with tarfile.open(tar_path, 'w') as tar:
        for i in range(6):
            x = (0.3 * rng.randn(800 + 100 * i, 2)).astype('float32')
            signals.append(x)
            buf = io.BytesIO()
            write_wav(buf, x, 16000)
            data = buf.getvalue()
            info = tarfile.TarInfo(f'audio/{i:05d}_mixture.wav')
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    with tarfile.open(tar_path) as tar:
        members = {m.name: m for m in tar.getmembers()}
    offsets = [members[f'audio/{i:05d}_mixture.wav'].offset_data
               for i in range(6)]
    sizes = [members[f'audio/{i:05d}_mixture.wav'].size for i in range(6)]
    batch, lengths = native.load_tar_batch(
        tar_path, offsets, sizes, 2, 1400)
    assert batch.shape == (6, 2, 1400)
    for i, x in enumerate(signals):
        assert lengths[i] == len(x)
        np.testing.assert_allclose(batch[i, :, :len(x)].T, x, atol=1e-7)
        assert np.all(batch[i, :, len(x):] == 0)


def test_native_loader_matches_python(tmp_path):
    """BreverDataLoader(native=True) must produce the same batches as
    the pure-Python path."""
    from brever_tpu.batching import SortedBatchSampler
    from brever_tpu.data import BreverDataLoader, BreverDataset

    # build a tiny wav tar dataset directly
    rng = np.random.RandomState(3)
    ds_dir = tmp_path / 'dset'
    os.makedirs(ds_dir)
    with tarfile.open(ds_dir / 'audio.tar', 'w') as tar:
        for i in range(5):
            n = 3000 + 500 * i
            for source in ('mixture', 'foreground'):
                x = (0.3 * rng.randn(n, 2)).astype('float32')
                buf = io.BytesIO()
                write_wav(buf, x, 16000)
                data = buf.getvalue()
                info = tarfile.TarInfo(f'audio/{i:05d}_{source}.wav')
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))

    ds = BreverDataset(path=str(ds_dir))
    sampler = SortedBatchSampler(ds, batch_size=3, shuffle=False)
    loader_py = BreverDataLoader(ds, sampler, pad_to_multiple=512)
    sampler2 = SortedBatchSampler(ds, batch_size=3, shuffle=False)
    loader_nat = BreverDataLoader(ds, sampler2, pad_to_multiple=512,
                                  native=True)
    assert loader_nat.native, 'native path should be eligible'

    for (b1, l1), (b2, l2) in zip(loader_py, loader_nat):
        np.testing.assert_array_equal(l1, l2)
        assert b1.shape == b2.shape
        np.testing.assert_allclose(b1, b2, atol=1e-7)


def test_native_decode_truncation_fuzz():
    """Truncated inputs must decode partially or raise ValueError —
    never crash (the loader feeds raw tar slices to this decoder)."""
    if not native.available():
        pytest.skip('native library unavailable')
    buf = io.BytesIO()
    x = (np.random.RandomState(0).randn(2000, 2) * 0.1).astype('float32')
    write_wav(buf, x, 16000)
    raw = buf.getvalue()
    for cut in range(1, len(raw), 257):
        try:
            out, n, fs = native.decode_wav(raw[:cut], 2000)
            assert 0 <= n <= 2000
        except ValueError:
            pass
