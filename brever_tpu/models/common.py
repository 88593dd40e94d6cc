"""Shared flax modules for the model zoo.

Channels-last convention: model internals keep tensors as
``(batch, time, channels)`` so the channel axis maps onto TPU lanes and
1x1 convolutions become MXU matmuls.
"""

import flax.linen as nn
import jax.numpy as jnp

from ..ops.normalization import causal_group_norm


class PReLU(nn.Module):
    """Parametric ReLU with a single learned slope (torch default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            'alpha', lambda key: jnp.full((1,), self.init, jnp.float32))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class GlobalLayerNorm(nn.Module):
    """torch ``GroupNorm(num_groups=1)`` equivalent: normalize over the
    channel *and* time axes per sample, with per-channel affine."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        # x: (batch, time, channels)
        n_channels = x.shape[-1]
        gain = self.param('scale', nn.initializers.ones, (n_channels,))
        bias = self.param('bias', nn.initializers.zeros, (n_channels,))
        axes = tuple(range(1, x.ndim))
        mean = x.mean(axis=axes, keepdims=True)
        var = ((x - mean)**2).mean(axis=axes, keepdims=True)
        normed = (x - mean) / jnp.sqrt(var + self.eps)
        return normed * gain + bias


class CausalLayerNormModule(nn.Module):
    """Cumulative layer norm over time, channels-last input.

    Wraps :func:`brever_tpu.ops.normalization.causal_group_norm`
    (which expects channels-second layout)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        # (batch, time, channels) -> (batch, channels, time)
        n_channels = x.shape[-1]
        gain = self.param('scale', nn.initializers.ones, (n_channels,))
        bias = self.param('bias', nn.initializers.zeros, (n_channels,))
        swapped = jnp.swapaxes(x, -1, -2)
        normed = causal_group_norm(swapped, 1, gain, bias, time_dim=-1,
                                   eps=self.eps)
        return jnp.swapaxes(normed, -1, -2)


def make_norm(causal, eps=1e-8):
    return CausalLayerNormModule(eps=eps) if causal \
        else GlobalLayerNorm(eps=eps)
