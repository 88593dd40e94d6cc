"""Acoustic feature extraction over complex STFTs (jittable).

Implements the reference's 12-feature family (reference
brever/modules/features.py:13-296): filterbank energies with
normalization/compression/DCT variants (fbe, logfbe, cubicfbe, pdf,
logpdf, cubicpdf, mfcc, cubicmfcc, pdfcc) and the binaural cues
(ild, ipd, ic).

TPU notes: the DCT is a precomputed matrix multiply (MXU); the
exponentially-weighted smoothing in ``ic`` is a first-order linear
recurrence evaluated with ``jax.lax.associative_scan`` (log-depth on
TPU instead of a sequential loop).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.fft

from ..utils import eps


def _dct_matrix(n, n_out=None, dct_type=2, norm='ortho'):
    """DCT as a matrix so it runs on the MXU; rows = output coefficients."""
    mat = scipy.fft.dct(np.eye(n), axis=0, type=dct_type, norm=norm)
    mat = mat.T  # (n_out, n_in) after transpose of column-wise transform
    if n_out is not None:
        mat = mat[:n_out]
    return mat.astype(np.float32)


def first_order_smooth(x, alpha, axis=-1):
    """y[t] = (1 - alpha) * x[t] + alpha * y[t-1] along ``axis``.

    Equivalent to ``lfilter(b=[1-alpha, 0], a=[1, -alpha])`` with zero
    initial conditions. Uses an associative scan for log-depth on TPU.
    """
    x = jnp.moveaxis(x, axis, 0)
    a = jnp.full(x.shape, alpha, dtype=x.dtype)
    b = (1 - alpha) * x

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, y = jax.lax.associative_scan(combine, (a, b), axis=0)
    return jnp.moveaxis(y, 0, axis)


class FeatureExtractor:
    """Computes a sorted, concatenated feature stack from a complex STFT.

    Input shape ``(batch, channels=2, bins, frames)`` (or unbatched
    ``(channels, bins, frames)``); output ``(batch, n_features, frames)``.
    """

    def __init__(self, features, mel_fb, hop_length=256, fs=16e3):
        self.features = sorted(features)
        self.mel_fb = mel_fb
        self.hop_length = hop_length
        self.fs = fs
        self.indices = None
        n_mel = mel_fb.n_filters
        self._feature_dict = {
            'ild': dict(func=self.ild, n=n_mel),
            'ipd': dict(func=self.ipd, n=n_mel),
            'ic': dict(func=self.ic, n=n_mel),
            'fbe': dict(func=self.fbe, n=n_mel),
            'logfbe': dict(
                func=lambda x: self.fbe(x, compression='log'), n=n_mel),
            'cubicfbe': dict(
                func=lambda x: self.fbe(x, compression='cubic'), n=n_mel),
            'pdf': dict(
                func=lambda x: self.fbe(x, normalize=True), n=n_mel),
            'logpdf': dict(
                func=lambda x: self.fbe(x, normalize=True, compression='log'),
                n=n_mel),
            'cubicpdf': dict(
                func=lambda x: self.fbe(
                    x, normalize=True, compression='cubic'),
                n=n_mel),
            'mfcc': dict(
                func=lambda x: self.fbe(x, compression='log', dct=True),
                n=13 * 3),
            'cubicmfcc': dict(
                func=lambda x: self.fbe(x, compression='cubic', dct=True),
                n=13 * 3),
            'pdfcc': dict(
                func=lambda x: self.fbe(
                    x, normalize=True, compression='log', dct=True),
                n=13 * 3),
        }

    def __call__(self, x):
        output = []
        self.indices = {}
        i_start = 0
        for feature in self.features:
            data = self.calc_feature(x, feature)
            output.append(data)
            i_end = i_start + data.shape[-2]
            self.indices[feature] = (i_start, i_end)
            i_start = i_end
        return jnp.concatenate(output, axis=-2)

    def _info(self, feature):
        try:
            return self._feature_dict[feature]
        except KeyError:
            raise ValueError(f'unrecognized feature, got {feature}') from None

    @property
    def n_features(self):
        return sum(self._info(f)['n'] for f in self.features)

    def calc_feature(self, x, feature):
        unbatched = x.ndim == 3
        if unbatched:
            x = x[None]
        elif x.ndim != 4:
            raise ValueError(f'input must be 3 or 4 dimensional, got {x.ndim}')
        out = self._info(feature)['func'](x)
        if unbatched:
            out = out[0]
        return out

    def fbe(self, x, normalize=False, compression='none', dct=False, n_dct=14,
            dct_type=2, dct_norm='ortho', return_dc=False, return_deltas=True,
            return_double_deltas=True):
        """Filterbank energies and the MFCC/PDF family."""
        out = (jnp.abs(x)**2).mean(axis=1)  # (batch, bins, frames)
        out = self.mel_fb(out)
        if normalize:
            out = out / (out.sum(axis=1, keepdims=True) + eps)
        if compression == 'log':
            out = jnp.log(out + eps)
        elif compression == 'cubic':
            out = out**(1 / 3)
        elif compression != 'none':
            raise ValueError('compression must be log, cubic or none, got '
                             f'{compression}')
        if dct:
            dct_mat = jnp.asarray(
                _dct_matrix(out.shape[1], dct_type=dct_type, norm=dct_norm)
            )
            out = jnp.einsum('of,bft->bot', dct_mat, out)
            coeffs = out[:, 0:n_dct] if return_dc else out[:, 1:n_dct]
            parts = [coeffs]
            if return_deltas:
                diff = jnp.diff(coeffs, n=1, axis=2)
                parts.append(jnp.pad(diff, ((0, 0), (0, 0), (1, 0))))
            if return_double_deltas:
                diff2 = jnp.diff(coeffs, n=2, axis=2)
                parts.append(jnp.pad(diff2, ((0, 0), (0, 0), (2, 0))))
            out = jnp.concatenate(parts, axis=1)
        return out

    def ild(self, x):
        """Interaural level difference, mel-pooled."""
        mag = jnp.abs(x)
        ild = 20 * jnp.log10((mag[:, 1] + eps) / (mag[:, 0] + eps))
        return self.mel_fb(ild)

    def ipd(self, x):
        """Interaural phase difference, mel-pooled."""
        phase = jnp.angle(x)
        return self.mel_fb(phase[:, 1] - phase[:, 0])

    def ic(self, x, tau=10e-3):
        """Interaural coherence from exponentially-smoothed cross-spectra."""
        mag, phase = jnp.abs(x), jnp.angle(x)
        alpha = math.exp(-self.hop_length / (tau * self.fs))
        x_ll = mag[:, 0]**2
        x_rr = mag[:, 1]**2
        dphi = phase[:, 0] - phase[:, 1]
        x_lr_real = mag[:, 0] * mag[:, 1] * jnp.cos(dphi)
        x_lr_imag = mag[:, 0] * mag[:, 1] * jnp.sin(dphi)
        stacked = jnp.stack([x_ll, x_rr, x_lr_real, x_lr_imag])
        phi = first_order_smooth(stacked, alpha, axis=-1)
        phi_ll, phi_rr, phi_lr_real, phi_lr_imag = phi
        coh = (phi_lr_real**2 + phi_lr_imag**2) / (phi_ll * phi_rr)
        return jnp.sqrt(self.mel_fb(coh))
