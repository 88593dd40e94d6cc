"""Shared flax modules for the model zoo.

Channels-last convention: model internals keep tensors as
``(batch, time, channels)`` so the channel axis maps onto TPU lanes and
1x1 convolutions become MXU matmuls.
"""

import flax.linen as nn
import jax
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


def batch_norm(x, train, name, momentum=0.99, epsilon=1e-5):
    """``nn.BatchNorm`` that preserves the amp compute dtype.

    Call inside a ``@nn.compact`` body.  The running statistics live in
    the f32 ``batch_stats`` collection (aux collections are not
    amp-cast by the trainer), so flax's default output dtype promotes a
    bf16 trunk back to f32 at every norm — this wrapper casts the
    normalized output back to the input dtype (identity under f32).
    """
    out = nn.BatchNorm(use_running_average=not train, momentum=momentum,
                       epsilon=epsilon, name=name)(x)
    return out.astype(x.dtype)


#: minimum activation bytes before batch_norm_act routes through the
#: Pallas kernel (below this, dispatch overhead beats the byte savings)
_FUSED_BN_MIN_BYTES = 2 * 1024 * 1024

#: maximum channel (lane) width for the fused kernel: the flash-GN
#: BACKWARD hangs Mosaic compilation at C=1920 on v5e (standalone
#: bisect r5, /tmp/gn_repro2: C in {60..1536} compile+run in ~1 s,
#: C=1920 exceeds a 600 s timeout at every attempt; the one full-model
#: compile that got through, r5d manner at 567 s, crashed the TPU
#: worker at dispatch).  MANNER's sole wider BN (dec in_bn, C=1920,
#: ~31 MB) falls back to XLA — its byte win was negligible anyway.
_FUSED_BN_MAX_C = 1536


def batch_norm_act(x, train, name, act='none', momentum=0.99,
                   epsilon=1e-5):
    """BatchNorm fused with its trailing activation (flash-BN).

    Parameter and ``batch_stats`` trees are identical to
    ``batch_norm(name=name)`` (checkpoints interchange freely).  In
    train mode on the TPU backend, large tensors route through the
    flash-GN Pallas kernel by viewing the ``(..., C)`` tensor as a
    single GroupNorm row ``(1, prod(...), C)`` with ``num_groups=C`` —
    identical statistics (fast-variance form, like flax) and gradient,
    but HBM traffic is 3 passes fwd / 5 bwd at the input dtype instead
    of XLA's materialized multi-consumer f32 intermediates (the round-5
    MANNER byte census motivated this: see PERF.md).  Stats keep
    feeding the running-average update (no gradient, like flax).
    """

    class _FusedBN(nn.Module):

        @nn.compact
        def __call__(self, x, train):
            from ..ops.pallas.groupnorm import (
                gn_act_stats_pallas,
                gn_pallas_available,
            )
            c = x.shape[-1]
            scale = self.param('scale', nn.initializers.ones, (c,))
            bias = self.param('bias', nn.initializers.zeros, (c,))
            ra_mean = self.variable('batch_stats', 'mean',
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable('batch_stats', 'var',
                                   lambda: jnp.ones((c,), jnp.float32))
            import os
            # The r5d on-chip fault was bisected to the backward kernel
            # at C=1920 (see _FUSED_BN_MAX_C); every narrower MANNER
            # shape class passes standalone.  BREVER_BN_FUSED=0 force-
            # disables; default follows the hardware A/B (PERF.md).
            use_kernel = (
                train and gn_pallas_available()
                and os.environ.get('BREVER_BN_FUSED', '0') == '1'
                and c <= _FUSED_BN_MAX_C
                and x.size * x.dtype.itemsize >= _FUSED_BN_MIN_BYTES)
            if use_kernel:
                x3 = x.reshape(1, -1, c)
                # affine in the trunk dtype so the kernel writes y at
                # the trunk width (it upcasts to f32 internally)
                y, mean_g, rstd_g = gn_act_stats_pallas(
                    x3, scale.astype(x.dtype), bias.astype(x.dtype),
                    c, epsilon, act)
                y = y.reshape(x.shape)
                mean = mean_g.reshape(c)
                var = 1.0 / (rstd_g.reshape(c) ** 2) - epsilon
            else:
                if train:
                    x32 = x.astype(jnp.float32)
                    axes = tuple(range(x.ndim - 1))
                    mean = x32.mean(axis=axes)
                    var = (x32 * x32).mean(axis=axes) - mean * mean
                else:
                    mean, var = ra_mean.value, ra_var.value
                inv = scale * jax.lax.rsqrt(var + epsilon)
                y = ((x.astype(jnp.float32) - mean) * inv + bias) \
                    .astype(x.dtype)
                if act == 'relu':
                    y = nn.relu(y)
                elif act == 'silu':
                    y = y * jax.nn.sigmoid(y)
            if train and not self.is_initializing():
                ra_mean.value = momentum * ra_mean.value \
                    + (1 - momentum) * jax.lax.stop_gradient(mean)
                ra_var.value = momentum * ra_var.value \
                    + (1 - momentum) * jax.lax.stop_gradient(var)
            return y

    return _FusedBN(name=name)(x, train)


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
        # stats in f32 (fused into the reduction; activations stay in
        # the amp dtype in HBM — no extra bytes, just f32 accumulation)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=axes, keepdims=True)
        var = ((x32 - mean)**2).mean(axis=axes, keepdims=True)
        normed = (x32 - mean) / jnp.sqrt(var + self.eps)
        return (normed * gain + bias).astype(x.dtype)


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


class ComplexBatchNorm(nn.Module):
    """Complex batch norm via 2x2 covariance whitening (Trabelsi 2018).

    Input is channels-last with stacked real/imag halves:
    ``(batch, ..., 2*C)`` where the first C channels are the real parts.
    Statistics are per complex channel over batch+spatial dims; the
    affine transform has weights (W_rr, W_ri, W_ii) initialized to the
    identity and a complex bias. Behavior matches the reference's
    vendored cplxmodule ComplexBatchNorm2d
    (brever/models/dccrn/complex_batchnorm.py:29-187).
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train=False):
        n_channels = x.shape[-1] // 2
        in_dtype = x.dtype
        # stats + 2x2 whitening in f32 (sqrt/divide chain is too
        # precision-sensitive for bf16 amp inputs); output cast back
        x = x.astype(jnp.float32)
        # (2, batch, ..., C)
        z = jnp.stack([x[..., :n_channels], x[..., n_channels:]], axis=0)
        axes = tuple(range(1, z.ndim - 1))

        running_mean = self.variable(
            'batch_stats', 'mean',
            lambda: jnp.zeros((2, n_channels)))
        running_cov = self.variable(
            'batch_stats', 'cov',
            lambda: jnp.tile(jnp.eye(2)[:, :, None], (1, 1, n_channels)))
        weight = self.param(
            'weight',
            lambda key: jnp.tile(
                jnp.array([[1.0], [0.0], [1.0]], jnp.float32),
                                 (1, n_channels)))
        bias = self.param(
            'bias', nn.initializers.zeros, (2, n_channels))

        if train:
            mean = z.mean(axis=axes)
            centered = z - mean.reshape(2, *([1] * len(axes)), n_channels)
            var = (centered**2).mean(axis=axes) + self.eps
            cov_uv = (centered[0] * centered[1]).mean(
                axis=tuple(a - 1 for a in axes))
            cov = jnp.stack([var[0], cov_uv, cov_uv, var[1]]).reshape(
                2, 2, n_channels)
            if not self.is_initializing():
                running_mean.value = running_mean.value + self.momentum \
                    * (mean - running_mean.value)
                running_cov.value = running_cov.value + self.momentum \
                    * (cov - running_cov.value)
        else:
            mean = running_mean.value
            centered = z - mean.reshape(2, *([1] * len(axes)), n_channels)
            cov = running_cov.value

        cov_uu, cov_uv = cov[0, 0], cov[0, 1]
        cov_vu, cov_vv = cov[1, 0], cov[1, 1]
        # explicit inverse square root of the 2x2 covariance
        s = jnp.sqrt(cov_uu * cov_vv - cov_uv * cov_vu)
        t = jnp.sqrt(cov_uu + cov_vv + 2 * s)
        denom = t * s
        p = (cov_vv + s) / denom
        q = -cov_uv / denom
        r = -cov_vu / denom
        w = (cov_uu + s) / denom

        shape = (*([1] * len(axes)), n_channels)
        white_r = centered[0] * p.reshape(shape) \
            + centered[1] * r.reshape(shape)
        white_i = centered[0] * q.reshape(shape) \
            + centered[1] * w.reshape(shape)

        out_r = white_r * weight[0].reshape(shape) \
            + white_i * weight[1].reshape(shape) + bias[0].reshape(shape)
        out_i = white_r * weight[1].reshape(shape) \
            + white_i * weight[2].reshape(shape) + bias[1].reshape(shape)
        return jnp.concatenate([out_r, out_i], axis=-1).astype(in_dtype)


class DepthwiseConv1D(nn.Module):
    """Depthwise 1-D convolution as shifted multiplies (channels-last).

    Drop-in replacement for ``nn.Conv(features=C, kernel_size=(k,),
    feature_group_count=C)`` with a bit-identical parameter tree
    (``kernel`` of shape ``(k, 1, C)`` with the same lecun-normal fan,
    ``bias`` of shape ``(C,)``), but computed as ``k`` shifted
    elementwise multiply-adds instead of a grouped convolution:

    * XLA-CPU's grouped-convolution *backward* is scalarized and
      pathologically slow (measured: a single Conv-TasNet TCN backward
      = 60+ s of a 65 s train step on one core, >40x the forward);
      the shifted form differentiates into the same shifted form.
    * On TPU both forms are VPU elementwise work; the shifted form
      needs no im2col rewrite and fuses with neighbors.
    """

    features: int
    kernel_size: int
    kernel_dilation: int = 1
    #: explicit (lo, hi) time padding (stride is fixed at 1)
    padding: tuple = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (batch, time, channels)
        import jax

        k, d = self.kernel_size, self.kernel_dilation
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (k, 1, self.features), jnp.float32)
        w = kernel.astype(x.dtype)
        if k > 8 and jax.default_backend() == 'tpu':
            # wide kernels on TPU: keep the grouped-conv lowering (XLA
            # TPU handles it well; k shifted reads would multiply the
            # VPU work). The scalarized-backward pathology is
            # CPU-specific.
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[self.padding],
                rhs_dilation=(d,),
                dimension_numbers=('NWC', 'WIO', 'NWC'),
                feature_group_count=self.features)
        else:
            lo, hi = self.padding
            pad = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
            t_out = x.shape[1] + lo + hi - (k - 1) * d
            out = pad[:, :t_out, :] * w[0]
            for i in range(1, k):
                out = out + pad[:, i * d:i * d + t_out, :] * w[i]
        if self.use_bias:
            bias = self.param(
                'bias', nn.initializers.zeros_init(),
                (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out
