"""ctypes bindings for the native runtime (parallel tar/WAV loading).

Builds ``native/libbrever_native.so`` on first use (plain g++) and
exposes:

* :func:`decode_wav` — one in-memory WAV -> planar float32,
* :func:`load_tar_batch` — read+decode a batch of tar members in
  parallel (GIL-free) straight into a padded batch buffer.

Everything degrades gracefully: :func:`available` is False when no
toolchain/library is present and callers fall back to the pure-Python
codec in :mod:`brever_tpu.audio`.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libbrever_native.so')

_lib = None
_tried = False


def _build():
    try:
        subprocess.run(
            ['make', '-C', _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logging.debug(f'native build failed: {e}')
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logging.debug(f'native load failed: {e}')
        return None

    lib.bn_decode_wav.restype = ctypes.c_int64
    lib.bn_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bn_load_tar_batch.restype = ctypes.c_int32
    lib.bn_load_tar_batch.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.uint64, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.uint64, flags='C_CONTIGUOUS'),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
        np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS'),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def decode_wav(data, max_frames, channels=2):
    """Decode WAV bytes -> (planar float32 (channels, max_frames),
    n_frames, samplerate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    out = np.zeros((channels, max_frames), np.float32)
    ch = ctypes.c_int32()
    fs = ctypes.c_int32()
    n = lib.bn_decode_wav(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames, ctypes.byref(ch), ctypes.byref(fs))
    if n < 0:
        raise ValueError(f'native WAV decode failed (code {n})')
    if ch.value != channels:
        raise ValueError(
            f'expected {channels} channels, file has {ch.value}')
    return out, int(n), fs.value


def load_tar_batch(tar_path, offsets, sizes, channels, max_frames,
                   num_threads=0):
    """Read+decode ``len(offsets)`` WAV members into a padded batch.

    Returns ``(batch (n, channels, max_frames) float32, lengths (n,))``.
    ``num_threads=0`` uses the library default.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native library unavailable')
    offsets = np.ascontiguousarray(offsets, np.uint64)
    sizes = np.ascontiguousarray(sizes, np.uint64)
    n = len(offsets)
    out = np.zeros((n, channels, max_frames), np.float32)
    lengths = np.zeros(n, np.int64)
    failures = lib.bn_load_tar_batch(
        tar_path.encode(), offsets, sizes, n, channels, max_frames, out,
        lengths, num_threads)
    if failures != 0:
        raise RuntimeError(
            f'native tar batch load: {failures} member(s) failed')
    return out, lengths
