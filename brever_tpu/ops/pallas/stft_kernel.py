"""Fused STFT as a Pallas TPU kernel.

Computes the framed, windowed, matmul-form DFT in one kernel:
each grid step holds one signal row in VMEM, assembles a tile of
frames with static strided slices (no HBM-side frame materialization),
and contracts it against the windowed rDFT basis on the MXU, writing
``(frames, 2*bins)`` real/imag outputs.

Rationale: ``jnp.fft.rfft`` lowers to XLA's generic FFT, which is not
an MXU op; for frame lengths up to ~1024 the dense rDFT matmul is
faster on TPU and Pallas additionally fuses the framing gather and
window multiply into the same VMEM pass. The kernel is numerically
identical to ``ops.stft.STFT`` (same basis, fp32 accumulation).

Used through ``ops.stft.STFT(backend='pallas')`` on TPU; everything
falls back to the jnp path on other platforms.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False


def pallas_stft_available():
    return _PALLAS_OK and jax.default_backend() in ('tpu',)


def _stft_kernel(x_ref, basis_ref, out_ref, *, frame_length, hop_length,
                 frames_per_tile):
    """One grid step: (1, signal) row -> (frames_tile, 2*bins) block."""
    tile = pl.program_id(1)
    start = tile * frames_per_tile * hop_length

    # frame t = [chunk_t | chunk_{t+1} | ... | chunk_{t+k-1}] where
    # chunk_j = signal[(start + j*hop) : ...+hop]; instead of
    # materializing frames (Mosaic cannot concat misaligned slices),
    # decompose the windowed-DFT matmul over chunks:
    #   frames @ B = sum_j chunks[j:j+T] @ B[j*hop:(j+1)*hop]
    # with each shifted chunk view produced by an aligned roll.
    n_chunks = frame_length // hop_length
    chunk_span = (frames_per_tile + n_chunks - 1) * hop_length
    seg = x_ref[0, 0, pl.ds(start, chunk_span)]
    chunks = seg.reshape(frames_per_tile + n_chunks - 1, hop_length)

    acc = jnp.zeros((frames_per_tile, basis_ref.shape[1]), jnp.float32)
    for j in range(n_chunks):
        n_rows = chunks.shape[0]
        rolled = pltpu.roll(chunks, shift=n_rows - j, axis=0) if j \
            else chunks
        part = rolled[:frames_per_tile]
        acc += jnp.dot(
            part,
            basis_ref[j * hop_length:(j + 1) * hop_length, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=(
    'frame_length', 'hop_length', 'frames_per_tile'))
def _pallas_stft_padded(x, basis, frame_length, hop_length,
                        frames_per_tile):
    """x: (rows, padded_samples) with an integer number of frame tiles;
    returns (rows, frames, 2*bins)."""
    rows, n = x.shape
    n_frames = (n - frame_length) // hop_length + 1
    n_tiles = n_frames // frames_per_tile
    n_bins2 = basis.shape[1]
    x = x[:, None]  # (rows, 1, n): block dims must tile the array

    return pl.pallas_call(
        functools.partial(
            _stft_kernel,
            frame_length=frame_length,
            hop_length=hop_length,
            frames_per_tile=frames_per_tile,
        ),
        grid=(rows, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_length, n_bins2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frames_per_tile, n_bins2),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (rows, n_frames, n_bins2), jnp.float32),
    )(x, basis)


class PallasSTFT:
    """Drop-in forward STFT core: ``(…, samples) -> (…, bins, frames)``
    complex, matching the jnp path of ``ops.stft.STFT.forward``.

    Constraints: ``hop`` divides ``frame_length``; onesided; real input.
    """

    def __init__(self, frame_length, hop_length, window,
                 frames_per_tile=128):
        assert frame_length % hop_length == 0
        self.frame_length = frame_length
        self.hop_length = hop_length
        self.frames_per_tile = frames_per_tile
        # windowed rDFT basis: (frame_length, 2*bins), real | imag
        dft = np.fft.rfft(np.eye(frame_length), axis=1)
        windowed = window[:, None] * dft
        # keep the basis as host numpy: converting lazily per call makes
        # it a per-trace constant instead of a cached tracer (this class
        # may be constructed inside a jit trace)
        self.basis_np = np.concatenate(
            [windowed.real, windowed.imag], axis=1).astype(np.float32)
        self.n_bins = frame_length // 2 + 1

    def __call__(self, x):
        # x: (..., n) already padded by the caller (center + integer
        # frames, like STFT.forward does before framing)
        leading = x.shape[:-1]
        n = x.shape[-1]
        rows = int(np.prod(leading)) if leading else 1
        flat = x.reshape(rows, n).astype(jnp.float32)

        n_frames = (n - self.frame_length) // self.hop_length + 1
        # pad the frame count to a tile multiple (extra frames read
        # zero-padded signal and are dropped)
        tile = self.frames_per_tile
        padded_frames = -(-n_frames // tile) * tile
        needed = (padded_frames - 1) * self.hop_length + self.frame_length
        if needed > n:
            flat = jnp.pad(flat, ((0, 0), (0, needed - n)))

        out = _pallas_stft_padded(
            flat, jnp.asarray(self.basis_np), self.frame_length,
            self.hop_length, tile)
        out = out[:, :n_frames]
        real = out[..., :self.n_bins]
        imag = out[..., self.n_bins:]
        spec = jax.lax.complex(real, imag)          # (rows, frames, bins)
        spec = jnp.swapaxes(spec, -1, -2)           # (rows, bins, frames)
        return spec.reshape(*leading, self.n_bins, n_frames)


def pallas_stft(x, frame_length, hop_length, window, frames_per_tile=128):
    """Functional wrapper around :class:`PallasSTFT`."""
    return PallasSTFT(frame_length, hop_length, np.asarray(window),
                      frames_per_tile)(x)
