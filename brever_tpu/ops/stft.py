"""Short-time Fourier transform and mel filterbank, as pure JAX ops.

TPU-first design notes
----------------------
* Framing is a strided gather; XLA fuses the window multiply into the
  surrounding ops and lowers the batched rFFT to its native TPU FFT.
  All shapes are static functions of the input length, so these are safe
  to call inside ``jax.jit``.
* The overlap-add inverse uses a scatter-add (``.at[].add``) which XLA
  lowers to an efficient dynamic-update loop on TPU.
* ``ConvSTFT`` expresses the same transform as a conv1d against a DFT
  matrix — this variant rides the MXU and is the better choice inside
  models that already live in conv-land (e.g. learned encoders).

Behavioral contract (mirrors the reference implementation, see
reference brever/modules/stft.py:12-319):
* inputs are right-padded so no trailing samples are lost:
  ``frames = ceil(max(n - frame_length, 0) / hop) + 1``,
* ``normalized=True`` divides by ``sqrt(sum(window**2))``,
* magnitude compression ``|X|**c * exp(j*angle(X))`` and scale factor,
* round trip ``backward(forward(x)) == x`` to atol 1e-6 / rtol 2e-3.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..utils import fft_freqs


def _get_window(window, frame_length):
    if window is None:
        window = 'boxcar'
    if isinstance(window, str):
        window = functools.partial(scipy.signal.get_window, window)
    if callable(window):
        window = window(frame_length)
    return np.asarray(window, dtype=np.float32)


def frame_signal(x, frame_length, hop_length):
    """Extract overlapping frames along the last axis.

    Input shape ``(..., n)``; output ``(..., T, frame_length)`` with
    ``T = (n - frame_length) // hop + 1``.

    Implemented with static strided slices for every (length, hop)
    combination — never a 2-D gather.  The signal is chunked into
    ``hop``-sized pieces; frame ``i`` is the concatenation of chunks
    ``i .. i+ceil(L/hop)-1`` trimmed to ``L``.  The gather formulation is
    catastrophically slower on TPU (the loss backward becomes a serial
    scatter-add; measured 39 -> 3 ms for the MANNER multi-resolution
    STFT loss gradient) and ~9x slower to Mosaic-compile.
    """
    n = x.shape[-1]
    n_frames = (n - frame_length) // hop_length + 1
    k = -(-frame_length // hop_length)  # chunks per frame (ceil)
    m = n_frames + k - 1                # chunks needed overall
    pad = m * hop_length - n
    if pad > 0:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, widths)
    chunks = x[..., :m * hop_length].reshape(
        *x.shape[:-1], m, hop_length
    )
    parts = [
        jax.lax.slice_in_dim(chunks, j, j + n_frames, axis=-2)
        for j in range(k)
    ]
    frames = jnp.concatenate(parts, axis=-1)
    if k * hop_length != frame_length:
        frames = frames[..., :frame_length]
    return frames


def overlap_add(frames, hop_length, out_length):
    """Overlap-add frames of shape ``(..., T, L)`` into ``(..., out_length)``.

    Implemented without scatter: each intra-frame offset ``k`` in
    ``range(L // hop)`` contributes a non-overlapping strided segment, so the
    sum is a static reshape/pad — XLA fuses this far better than a gather
    scatter-add on TPU.
    """
    *batch, n_frames, frame_length = frames.shape
    n_chunks = -(-frame_length // hop_length)  # ceil
    padded_len = n_frames * hop_length + n_chunks * hop_length
    out = jnp.zeros((*batch, padded_len), frames.dtype)
    frames_padded = jnp.pad(
        frames,
        [(0, 0)] * (frames.ndim - 1) + [(0, n_chunks * hop_length - frame_length)],
    )
    # (..., T, n_chunks, hop) -> sum chunks shifted by one frame each
    chunks = frames_padded.reshape(*batch, n_frames, n_chunks, hop_length)
    for k in range(n_chunks):
        seg = chunks[..., k, :].reshape(*batch, n_frames * hop_length)
        out = out.at[..., k * hop_length:(k + n_frames) * hop_length].add(seg)
    return out[..., :out_length]


class STFT:
    """STFT/iSTFT with compression, matching the reference numerics.

    Static configuration lives on the object; ``forward``/``backward`` are
    pure and jittable.
    """

    def __init__(self, frame_length=512, hop_length=256, window='hann',
                 center=True, pad_mode='constant', normalized=True,
                 onesided=True, compression_factor=1, scale_factor=1,
                 n_fft=None, backend='auto'):
        self.frame_length = frame_length
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.normalized = normalized
        self.onesided = onesided
        self.compression_factor = compression_factor
        self.scale_factor = scale_factor
        self.n_fft = frame_length if n_fft is None else n_fft
        self.backend = backend

        window = _get_window(window, frame_length)
        if self.n_fft > frame_length:
            # center the analysis window inside the FFT frame
            left = (self.n_fft - frame_length) // 2
            window = np.pad(window, (left, self.n_fft - frame_length - left))
        self.window = jnp.asarray(window)
        self._win_norm = float(np.sqrt(np.sum(window.astype(np.float64)**2)))
        self._np_window = window
        self._pallas = None

    def _pallas_core(self):
        """Lazily build the fused Pallas forward core (opt-in via
        ``backend='pallas'``; requires onesided and hop | n_fft).

        Measured on a v5e: the fused framing+window+rDFT-matmul kernel
        matches XLA's rfft path (both ~0.7 ms for 16x4 s at 512/256 —
        dispatch-floor dominated; the STFT is not a bottleneck at
        speech-enhancement sizes), so 'auto' keeps the jnp path and the
        kernel remains available for configurations where the MXU form
        wins (e.g. very large batches of short transforms).
        """
        if self.backend != 'pallas':
            return None
        if self._pallas is None:
            from .pallas.stft_kernel import PallasSTFT
            eligible = (
                self.onesided and self.n_fft % self.hop_length == 0
            )
            self._pallas = PallasSTFT(
                self.n_fft, self.hop_length, self._np_window
            ) if eligible else False
        return self._pallas or None

    def __call__(self, x, return_type='complex'):
        return self.forward(x, return_type=return_type)

    def forward(self, x, return_type='complex'):
        x = self.pad(x)
        if self.center:
            widths = [(0, 0)] * (x.ndim - 1) \
                + [(self.n_fft // 2, self.n_fft // 2)]
            mode = 'constant' if self.pad_mode == 'constant' else self.pad_mode
            x = jnp.pad(x, widths, mode=mode)
        pallas_core = self._pallas_core() \
            if not jnp.iscomplexobj(x) else None
        if pallas_core is not None:
            spec = pallas_core(x)  # (..., bins, frames), fused kernel
        else:
            frames = frame_signal(x, self.n_fft, self.hop_length)
            frames = frames * self.window
            if self.onesided:
                spec = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
            else:
                spec = jnp.fft.fft(frames, n=self.n_fft, axis=-1)
            spec = jnp.swapaxes(spec, -1, -2)  # (..., bins, frames)

        if self.normalized:
            spec = spec / self._win_norm
        if self.compression_factor != 1:
            spec = compress(spec, self.compression_factor)
        spec = spec * self.scale_factor

        if return_type == 'complex':
            return spec
        if return_type == 'real_imag':
            return spec.real, spec.imag
        if return_type == 'mag_phase':
            return jnp.abs(spec), jnp.angle(spec)
        raise ValueError('return_type must be complex, real_imag or '
                         f'mag_phase, got {return_type}')

    def backward(self, x, input_type='complex'):
        if input_type == 'real_imag':
            real, imag = x
            x = real + 1j * imag
        elif input_type == 'mag_phase':
            mag, phase = x
            x = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
        elif input_type != 'complex':
            raise ValueError('input_type must be complex, real_imag or '
                             f'mag_phase, got {input_type}')

        x = x / self.scale_factor
        if self.compression_factor != 1:
            x = compress(x, 1 / self.compression_factor)
        if self.normalized:
            x = x * self._win_norm

        x = jnp.swapaxes(x, -1, -2)  # (..., frames, bins)
        if self.onesided:
            frames = jnp.fft.irfft(x, n=self.n_fft, axis=-1)
        else:
            frames = jnp.fft.ifft(x, n=self.n_fft, axis=-1).real

        n_frames = frames.shape[-2]
        out_length = (n_frames - 1) * self.hop_length + self.n_fft
        num = overlap_add(frames * self.window, self.hop_length, out_length)
        den = overlap_add(
            jnp.broadcast_to(self.window**2, frames.shape),
            self.hop_length, out_length,
        )
        y = num / jnp.where(den > 1e-11, den, 1.0)
        if self.center:
            half = self.n_fft // 2
            y = y[..., half:out_length - half]
        return y

    def pad(self, x):
        """Right-pad so the signal holds an integer number of frames."""
        n = x.shape[-1]
        padding = (self.frame_count(n) - 1) * self.hop_length \
            + self.frame_length - n
        widths = [(0, 0)] * (x.ndim - 1) + [(0, padding)]
        return jnp.pad(x, widths)

    def frame_count(self, samples):
        """Frame count before the center padding is applied."""
        return math.ceil(max(samples - self.frame_length, 0)
                         / self.hop_length) + 1


def compress(x, factor):
    """Magnitude compression ``|x|**factor * exp(1j*angle(x))``.

    Implemented with real ops (arctan2/cos/sin) — complex transcendentals
    are not universally lowered on TPU backends.
    """
    mag = jnp.abs(x)**factor
    theta = jnp.arctan2(x.imag, x.real)
    return jax.lax.complex(mag * jnp.cos(theta), mag * jnp.sin(theta))


class MelFilterbank:
    """Triangular mel filterbank (HTK formula), area-normalized.

    ``forward`` maps linear-frequency bins to mel bands (a matmul — MXU
    friendly); ``backward`` extrapolates band values back to bins through
    the stored pseudo-inverse. Reference: brever/modules/stft.py:152-198.
    """

    def __init__(self, n_filters=64, n_fft=512, fs=16e3, fmin=50, fmax=8000):
        self.n_filters = n_filters
        self.n_fft = n_fft
        self.fs = fs
        self.fmin = fmin
        self.fmax = fmax
        filters, fc, scaling = self._build()
        self.filters = jnp.asarray(filters)
        self.fc = fc
        self.scaling = scaling
        self.inverse_filters = jnp.asarray((filters * scaling).T)

    def _build(self):
        mel_lims = [self.freq_to_mel(f) for f in (self.fmin, self.fmax)]
        mel = np.linspace(*mel_lims, self.n_filters + 2)
        fc = self.mel_to_freq(mel)
        f = fft_freqs(self.fs, self.n_fft).astype(np.float32)
        filters = np.zeros((self.n_filters, len(f)), dtype=np.float32)
        for i in range(1, self.n_filters + 1):
            rising = (fc[i - 1] <= f) & (f <= fc[i])
            filters[i - 1, rising] = \
                (f[rising] - fc[i - 1]) / (fc[i] - fc[i - 1])
            falling = (fc[i] <= f) & (f <= fc[i + 1])
            filters[i - 1, falling] = \
                (fc[i + 1] - f[falling]) / (fc[i + 1] - fc[i])
        scaling = filters.sum(axis=1, keepdims=True)
        filters = filters / scaling
        return filters, fc, scaling

    @staticmethod
    def mel_to_freq(mel):
        return 700 * (10**(mel / 2595) - 1)

    @staticmethod
    def freq_to_mel(f):
        return 2595 * math.log10(1 + f / 700)

    def __call__(self, x):
        return self.forward(x)

    def forward(self, x):
        return jnp.matmul(self.filters.astype(x.dtype), x)

    def backward(self, x):
        return jnp.matmul(self.inverse_filters.astype(x.dtype), x)


class ConvSTFT:
    """STFT as a conv1d against real/imag DFT filters.

    This formulation keeps analysis/synthesis on the MXU and matches the
    reference's seamless analysis-synthesis scaling, including the DC
    ``1/sqrt(2)`` trick (reference brever/modules/stft.py:201-319).
    Uses the square root of the requested window so that
    analysis*synthesis windows overlap-add to a constant.
    """

    def __init__(self, frame_length=512, hop_length=256, window='hann',
                 compression_factor=1, scale_factor=1, normalized=True):
        self.frame_length = frame_length
        self.hop_length = hop_length
        self.compression_factor = compression_factor
        self.scale_factor = scale_factor
        self.normalized = normalized

        if isinstance(window, str):
            window = scipy.signal.get_window(window, frame_length)**0.5
        window = np.asarray(window, dtype=np.float64)
        self.window = window

        dft = np.fft.fft(np.eye(frame_length))[:frame_length // 2 + 1]
        dft[0, :] /= 2**0.5
        self._norm = 0.5 * frame_length / hop_length**0.5
        if normalized:
            dft = dft / self._norm
        dft = dft * window
        filters = np.concatenate([dft.real, dft.imag]).astype(np.float32)
        self.filters = jnp.asarray(filters)  # (2*bins, frame_length)

    def __call__(self, x, return_type='complex'):
        return self.forward(x, return_type=return_type)

    def forward(self, x, return_type='complex'):
        x = self.pad(x)
        frames = frame_signal(x, self.frame_length, self.hop_length)
        # (..., T, L) @ (L, 2*bins) -> (..., T, 2*bins)
        out = jnp.matmul(frames, self.filters.T)
        out = jnp.swapaxes(out, -1, -2)  # (..., 2*bins, T)
        n_bins = self.frame_length // 2 + 1
        real = out[..., :n_bins, :]
        imag = out[..., n_bins:, :]

        if self.compression_factor != 1:
            r = jnp.sqrt(real**2 + imag**2)**self.compression_factor
            theta = jnp.arctan2(imag, real)
            real, imag = r * jnp.cos(theta), r * jnp.sin(theta)
        real = real * self.scale_factor
        imag = imag * self.scale_factor

        if return_type == 'real_imag':
            return real, imag
        if return_type == 'mag_phase':
            return jnp.sqrt(real**2 + imag**2), jnp.arctan2(imag, real)
        if return_type == 'complex':
            return real + 1j * imag
        raise ValueError('return_type must be complex, real_imag or '
                         f'mag_phase, got {return_type}')

    def backward(self, x, input_type='complex'):
        if input_type == 'real_imag':
            real, imag = x
        elif input_type == 'mag_phase':
            mag, phase = x
            real, imag = mag * jnp.cos(phase), mag * jnp.sin(phase)
        elif input_type == 'complex':
            real, imag = x.real, x.imag
        else:
            raise ValueError('input_type must be complex, real_imag or '
                             f'mag_phase, got {input_type}')

        real = real / self.scale_factor
        imag = imag / self.scale_factor
        if self.compression_factor != 1:
            r = jnp.sqrt(real**2 + imag**2)**(1 / self.compression_factor)
            theta = jnp.arctan2(imag, real)
            real, imag = r * jnp.cos(theta), r * jnp.sin(theta)

        coeffs = jnp.concatenate([real, imag], axis=-2)  # (..., 2*bins, T)
        coeffs = jnp.swapaxes(coeffs, -1, -2)  # (..., T, 2*bins)
        # transpose conv == per-frame synthesis then overlap-add
        frames = jnp.matmul(coeffs, self.filters)  # (..., T, L)
        n_frames = frames.shape[-2]
        out_length = (n_frames - 1) * self.hop_length + self.frame_length
        y = overlap_add(frames, self.hop_length, out_length)
        if not self.normalized:
            y = y / self._norm**2
        trim = self.frame_length - self.hop_length
        return y[..., trim:out_length - trim]

    def pad(self, x):
        n = x.shape[-1]
        padding = (self.frame_count(n) - 1) * self.hop_length \
            + self.frame_length - n
        widths = [(0, 0)] * (x.ndim - 1) + [(0, padding)]
        x = jnp.pad(x, widths)
        # extra frame on each side for perfect edge reconstruction
        trim = self.frame_length - self.hop_length
        widths = [(0, 0)] * (x.ndim - 1) + [(trim, trim)]
        return jnp.pad(x, widths)

    def frame_count(self, samples):
        return math.ceil(max(samples - self.frame_length, 0)
                         / self.hop_length) + 1
