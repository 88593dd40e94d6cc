"""Training criteria (masked, jittable, PIT-capable).

Numerical contract carried over from the reference (reference
brever/criterion.py:21-234): every criterion takes ``(x, y, lengths)``
with zero-padded batches and must give identical results batched-padded
vs per-item — padding is neutralized by masking *before and after* any
mean subtraction.

All criteria are pure jnp functions: they trace into model loss
functions and run on device inside the sharded train step.
"""

import inspect as _inspect
from itertools import permutations

import jax.numpy as jnp
import numpy as np

from .ops import STFT
from .registry import Registry

eps = float(np.finfo(np.float32).eps)

CriterionRegistry = Registry('criterion')


def init_criterion(name, **kwargs):
    criterion = CriterionRegistry.get(name)
    if _inspect.isclass(criterion):
        criterion = criterion(**kwargs)
    return criterion


def length_mask(shape, lengths, dtype=jnp.float32):
    """Mask of ones up to ``lengths`` along the last axis, zeros after."""
    idx = jnp.arange(shape[-1])
    mask = idx[None, :] < lengths[:, None]  # (batch, length)
    mask = mask.reshape(shape[0], *([1] * (len(shape) - 2)), shape[-1])
    return jnp.broadcast_to(mask, shape).astype(dtype)


def apply_mask(x, y, lengths):
    """Zero the padded tail of both tensors (reference contract)."""
    mask = length_mask(x.shape, lengths, x.dtype)
    return x * mask, y * mask


@CriterionRegistry.register('sisnr')
def sisnr(x, y, lengths):
    """Scale-invariant SNR with permutation-invariant training.

    ``x``/``y``: ``(batch, sources, length)``; returns ``(batch,)`` loss
    (negated SI-SNR averaged over the best source permutation).
    """
    assert x.shape == y.shape and x.ndim == 3

    # mask, mean-subtract over true lengths, re-mask
    x, y = apply_mask(x, y, lengths)
    denom = jnp.maximum(lengths, 1).reshape(-1, 1, 1).astype(x.dtype)
    x = x - x.sum(axis=2, keepdims=True) / denom
    y = y - y.sum(axis=2, keepdims=True) / denom
    x, y = apply_mask(x, y, lengths)

    # pairwise SI-SNR matrix: estimate i vs target j
    s_hat = x[:, None, :, :]   # (B, 1, S, L)
    s = y[:, :, None, :]       # (B, S, 1, L)
    s_target = (s_hat * s).sum(axis=3, keepdims=True) * s \
        / (s**2).sum(axis=3, keepdims=True)
    e_noise = s_hat - s_target
    ratio = (s_target**2).sum(axis=3) / ((e_noise**2).sum(axis=3) + eps)
    si_snr = 10 * jnp.log10(ratio + eps)  # (B, S, S)

    n_sources = x.shape[1]
    perms = np.array(list(permutations(range(n_sources))))  # (P, S)
    # sum si_snr[b, j, perm[j]] over j for each permutation
    gathered = si_snr[:, np.arange(n_sources)[None, :], perms[:, :]]
    best = gathered.sum(axis=-1).max(axis=-1) / n_sources
    return -best


@CriterionRegistry.register('snr')
def snr(x, y, lengths):
    """Element-wise SNR (no PIT); ``(batch, ..., length)`` -> ``(batch,)``."""
    assert x.shape == y.shape and x.ndim >= 2
    x, y = apply_mask(x, y, lengths)
    ratio = (y**2).sum(axis=-1) / (((y - x)**2).sum(axis=-1) + eps)
    out = -10 * jnp.log10(ratio + eps)
    return out.mean(axis=tuple(range(1, x.ndim - 1)))


@CriterionRegistry.register('mse')
def mse(x, y, lengths, weight=None):
    """Length-normalized MSE with optional per-sample weight."""
    assert x.shape == y.shape and x.ndim >= 2
    x, y = apply_mask(x, y, lengths)
    loss = (jnp.abs(x - y)**2).sum(axis=-1)
    shape = (-1,) + (1,) * (x.ndim - 2)
    loss = loss / jnp.maximum(lengths, 1).reshape(shape).astype(loss.dtype)
    if weight is not None:
        loss = loss * weight.reshape(shape)
    return loss.mean(axis=tuple(range(1, x.ndim - 1)))


@CriterionRegistry.register('multiresyu')
class MultiResYuLoss:
    """Multi-resolution STFT magnitude L1 + time-domain L1 loss.

    The ESPnet-SE L3DAS22 loss (Lu et al., ICASSP 2022); optional
    scale-invariance. Reference: brever/criterion.py:135-226.
    """

    def __init__(self, frame_lengths=[512], hop_lengths=None,
                 time_domain_weight=0.5, spectral_weight=0.5,
                 scale_invariant=False):
        if hop_lengths is None:
            hop_lengths = [f // 2 for f in frame_lengths]
        self.stfts = [
            STFT(frame_length=f, hop_length=h, window=None, normalized=False)
            for f, h in zip(frame_lengths, hop_lengths)
        ]
        self.time_domain_weight = time_domain_weight
        self.spectral_weight = spectral_weight
        self.scale_invariant = scale_invariant

    def __call__(self, x, y, lengths):
        assert x.shape == y.shape
        x, y = apply_mask(x, y, lengths)

        if self.scale_invariant:
            scaling = (x * y).sum(axis=-1, keepdims=True) / \
                ((x**2).sum(axis=-1, keepdims=True) + eps)
        else:
            scaling = 1.0

        out = self.time_domain_weight * jnp.abs(scaling * x - y).sum(axis=-1)

        for stft in self.stfts:
            y_mag = jnp.abs(stft(y))
            x_mag = jnp.abs(stft(scaling * x))
            spectral = jnp.abs(x_mag - y_mag).sum(axis=(-2, -1))
            out = out + self.spectral_weight * spectral / len(self.stfts)

        shape = (-1,) + (1,) * (x.ndim - 2)
        out = out / jnp.maximum(lengths, 1).reshape(shape).astype(out.dtype)
        return out.mean(axis=tuple(range(1, x.ndim - 1)))
