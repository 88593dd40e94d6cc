"""MANNER: multi-view attention network for time-domain enhancement.

Park et al., ICASSP 2022 (small variant, as trained by the reference).
Behavioral reference: brever/models/manner/* (vendored upstream code);
default geometry carries 21,253,921 trainable parameters (pinned).

Structure: conv U-Net over the raw waveform (depth 4, stride 4,
hidden 60, channel growth 2) with residual Conformer blocks and, at the
deepest encoder/decoder level, a three-branch multi-view attention
block (channel attention / chunked global self-attention / chunked
local attention); loss = energy-weighted L1 (or Charbonnier) between
clean and noise estimates plus a multi-resolution STFT loss; OneCycle
LR schedule stepped per update.

TPU notes: channels-last layout; the overlapped chunking for global/
local attention is static reshaping (frame/overlap-add from ops.stft);
the OneCycle schedule is an optax ``cosine_onecycle_schedule`` sized by
``prepare_optimizer``; conv-weight rescaling (std -> 0.1) is applied to
the initialized parameter pytree like the upstream ``rescale_module``.
"""

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import STFT
from ..ops.stft import frame_signal, overlap_add
from .base import BreverBaseModel, ModelRegistry
from .common import DepthwiseConv1D, batch_norm_act


# ---------------------------------------------------------------------------
# space-to-depth lane packing
#
# The trunk of this architecture is 60-channel at full time resolution.
# TPU tiles are (8 sublanes, 128 lanes) with the minor axis on lanes, so
# a (B, T, 60) activation is stored — and moved through HBM — as
# (B, T, 128): every byte-bound op pays 2.13x its logical traffic. The
# fix is the classic space-to-depth transform: fold time pairs into
# channels, (B, T, C) -> (B, T/2, 2C) with packed index c*2 + j
# (c = logical channel, j = time phase), so the minor axis becomes 120
# (or 240) and pads to 128 (256) instead.
#
# Every conv at the two full-resolution U-Net levels is re-expressed in
# packed space by rearranging its LOGICAL kernel (parameter tree,
# checkpoint format and the 21,253,921-param pin are unchanged): for a
# logical conv y[s*t + k - p] the packed tap index solves
# k = 2n - 2*p_p + j_i - s*j + p over the (output phase j, input phase
# j_i) grid — a trace-time constant scatter of the logical kernel.
# Batch norms keep per-logical-channel statistics by averaging the two
# phase statistics (exact: equal counts).

def _pack2(x):
    """(B, T, C) -> (B, T//2, 2C), packed channel index = c*2 + j."""
    b, t, c = x.shape
    return x.reshape(b, t // 2, 2, c).transpose(0, 1, 3, 2) \
        .reshape(b, t // 2, 2 * c)


def _unpack2(x):
    b, u, c2 = x.shape
    return x.reshape(b, u, c2 // 2, 2).transpose(0, 1, 3, 2) \
        .reshape(b, 2 * u, c2 // 2)


def _packed_conv_kernel(w, stride, pad, pad_p, out_pack):
    """Rearrange a logical conv kernel (K, Cin_g, Cout) into packed
    space: (Kp, 2*Cin_g, 2*Cout) (or (Kp, 2*Cin_g, Cout) when the
    output stays unpacked)."""
    k_len, cin_g, cout = w.shape
    s = stride
    j_out = (0, 1) if out_pack else (0,)
    kp_len = (k_len - 1 + 2 * pad_p + (s if out_pack else 0) - pad) // 2 + 1
    wp = jnp.zeros((kp_len, cin_g, 2, cout, len(j_out)), w.dtype)
    for n in range(kp_len):
        for j in j_out:
            for j_i in (0, 1):
                k = 2 * n - 2 * pad_p + j_i - s * j + pad
                if 0 <= k < k_len:
                    wp = wp.at[n, :, j_i, :, j].set(w[k])
    return wp.reshape(kp_len, 2 * cin_g, cout * len(j_out))


class _PConv(nn.Module):
    """Conv over packed tensors holding logical-shape parameters
    (drop-in for ``nn.Conv`` at a packed call site: same param names,
    shapes and initializers, so checkpoints are layout-independent)."""

    features: int          # logical output channels
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    out_pack: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel, cin // self.groups, self.features))
        pad_p = (self.padding + 1) // 2
        wp = _packed_conv_kernel(
            w.astype(x.dtype), self.stride, self.padding, pad_p,
            self.out_pack)
        stride_p = self.stride if self.out_pack else self.stride // 2
        y = jax.lax.conv_general_dilated(
            x, wp, window_strides=(stride_p,),
            padding=[(pad_p, pad_p)],
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            feature_group_count=self.groups)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.features,))
            if self.out_pack:
                b = jnp.repeat(b, 2)
            y = y + b.astype(y.dtype)
        return y


class _PConvTranspose(nn.Module):
    """Transposed conv producing packed output (logical parameters)."""

    features: int
    kernel: int
    stride: int
    in_pack: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2 if self.in_pack else x.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (self.kernel, cin, self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        s = self.stride
        k_len = self.kernel
        # lax.conv_transpose('VALID') computes
        # y[t] = sum_{t'} x[t'] W[K-1 - (t - s*t')]; the packed kernel
        # entry for packed advance m = u - s_p*u' therefore lands at
        # slot Kp-1-m and reads the logical tap W[K-1-a] with
        # a = 2m + j - s*j_i (the phase-grid advance).
        if self.in_pack:
            kp_len = (k_len - 1 + s) // 2 + 1
            wp = jnp.zeros((kp_len, cin, 2, self.features, 2), w.dtype)
            for m in range(kp_len):
                for j in (0, 1):
                    for j_i in (0, 1):
                        a = 2 * m + j - s * j_i
                        if 0 <= a < k_len:
                            wp = wp.at[kp_len - 1 - m, :, j_i, :, j] \
                                .set(w[k_len - 1 - a])
            wp = wp.reshape(kp_len, 2 * cin, 2 * self.features)
            stride_p = s
        else:
            kp_len = (k_len - 1) // 2 + 1
            wp = jnp.zeros((kp_len, cin, self.features, 2), w.dtype)
            for m in range(kp_len):
                for j in (0, 1):
                    a = 2 * m + j
                    if 0 <= a < k_len:
                        wp = wp.at[kp_len - 1 - m, :, :, j] \
                            .set(w[k_len - 1 - a])
            wp = wp.reshape(kp_len, cin, 2 * self.features)
            stride_p = s // 2
        y = jax.lax.conv_transpose(
            x, wp.astype(x.dtype), strides=(stride_p,), padding='VALID',
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        return y + jnp.repeat(b, 2).astype(y.dtype)


def packed_batch_norm(x, train, name, act='none', momentum=0.99,
                      epsilon=1e-5):
    """``batch_norm`` over a packed tensor with per-LOGICAL-channel
    parameters and running statistics (phase statistics averaged —
    exact, both phases count B*U elements), optionally fused with the
    trailing activation.

    The packed pair (c*2, c*2+1) is a contiguous 2-channel group, so on
    TPU in train mode this is exactly the flash-GN kernel over
    ``(1, B*U, 2C)`` with ``num_groups=C`` (see
    ``common.batch_norm_act``)."""

    class _PackedBN(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            from ..ops.pallas.groupnorm import (
                gn_act_stats_pallas,
                gn_pallas_available,
            )
            from .common import _FUSED_BN_MAX_C, _FUSED_BN_MIN_BYTES
            c = x.shape[-1] // 2
            scale = self.param('scale', nn.initializers.ones, (c,))
            bias = self.param('bias', nn.initializers.zeros, (c,))
            ra_mean = self.variable('batch_stats', 'mean',
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable('batch_stats', 'var',
                                   lambda: jnp.ones((c,), jnp.float32))
            import os
            # r5d fault bisected to C=1920 bwd (common._FUSED_BN_MAX_C);
            # BREVER_BN_FUSED gates the hardware A/B (PERF.md)
            use_kernel = (
                train and gn_pallas_available()
                and os.environ.get('BREVER_BN_FUSED', '0') == '1'
                and 2 * c <= _FUSED_BN_MAX_C
                and x.size * x.dtype.itemsize >= _FUSED_BN_MIN_BYTES)
            if use_kernel:
                x3 = x.reshape(1, -1, 2 * c)
                out, mean_g, rstd_g = gn_act_stats_pallas(
                    x3, jnp.repeat(scale, 2).astype(x.dtype),
                    jnp.repeat(bias, 2).astype(x.dtype),
                    c, epsilon, act)
                out = out.reshape(x.shape)
                mean = mean_g.reshape(c)
                var = 1.0 / (rstd_g.reshape(c) ** 2) - epsilon
            else:
                if train:
                    x32 = x.astype(jnp.float32)
                    axes = tuple(range(x.ndim - 1))
                    m_p = x32.mean(axis=axes)          # (2C,)
                    m2_p = (x32 * x32).mean(axis=axes)
                    mean = m_p.reshape(c, 2).mean(-1)
                    var = m2_p.reshape(c, 2).mean(-1) - mean**2
                else:
                    mean, var = ra_mean.value, ra_var.value
                inv = scale * jax.lax.rsqrt(var + epsilon)
                out = ((x.astype(jnp.float32)
                        - jnp.repeat(mean, 2)) * jnp.repeat(inv, 2)
                       + jnp.repeat(bias, 2)).astype(x.dtype)
                if act == 'relu':
                    out = nn.relu(out)
                elif act == 'silu':
                    out = out * jax.nn.sigmoid(out)
            if train and not self.is_initializing():
                ra_mean.value = momentum * ra_mean.value \
                    + (1 - momentum) * jax.lax.stop_gradient(mean)
                ra_var.value = momentum * ra_var.value \
                    + (1 - momentum) * jax.lax.stop_gradient(var)
            return out

    return _PackedBN(name=name)(x, train)


class _BasicConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    relu: bool = True
    bn: bool = True
    use_bias: bool = False
    pack: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        act = 'relu' if self.relu else 'none'
        if self.pack:
            x = _PConv(self.features, self.kernel, self.stride,
                       self.padding, use_bias=self.use_bias,
                       name='conv')(x)
            if self.bn:
                x = packed_batch_norm(x, train, 'bn', act=act)
        else:
            x = nn.Conv(self.features, (self.kernel,),
                        strides=(self.stride,),
                        padding=((self.padding, self.padding),),
                        use_bias=self.use_bias, name='conv')(x)
            if self.bn:
                x = batch_norm_act(x, train, 'bn', act=act)
        if self.relu and not self.bn:
            x = nn.relu(x)
        return x


class _ResConBlock(nn.Module):
    """Residual Conformer block: PW-GLU -> depthwise -> PW, +shortcut."""

    in_channels: int
    growth1: float = 2
    growth2: float = 2
    kernel: int = 31
    pack: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        out1 = int(self.in_channels * self.growth1)
        out2 = int(self.in_channels * self.growth2)
        bn = packed_batch_norm if self.pack else batch_norm_act
        if self.pack:
            pad = (self.kernel - 1) // 2
            h = _PConv(out1, 1, use_bias=True, name='pw1')(x)
            h = bn(h, train, 'pw1_bn')
            # packed GLU: c-major packing keeps the logical halves
            # contiguous, so the split is layout-transparent
            a, b = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(b)
            h = _PConv(self.in_channels, self.kernel, padding=pad,
                       groups=self.in_channels, use_bias=False,
                       name='depthwise')(h)
        else:
            h = nn.Conv(out1, (1,), use_bias=True, name='pw1')(x)
            h = bn(h, train, 'pw1_bn')
            a, b = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(b)  # GLU over channels
            pad = (self.kernel - 1) // 2
            # shifted-multiply depthwise (same param tree as the
            # grouped nn.Conv; XLA-CPU scalarizes grouped-conv
            # backwards — see common.DepthwiseConv1D)
            h = DepthwiseConv1D(
                features=self.in_channels, kernel_size=self.kernel,
                padding=(pad, pad), use_bias=False,
                name='depthwise')(h)
        h = bn(h, train, 'dw_bn', act='silu')  # swish fused into the BN
        if self.pack:
            h = _PConv(out2, 1, use_bias=True, name='pw2')(h)
        else:
            h = nn.Conv(out2, (1,), use_bias=True, name='pw2')(h)
        h = bn(h, train, 'pw2_bn', act='silu')
        h = _BasicConv(out2, relu=False, pack=self.pack,
                       name='out_conv')(h, train)
        short = _BasicConv(out2, relu=False, pack=self.pack,
                           name='shortcut')(x, train)
        return nn.relu(h + short)


def _chunk(x, chunk, hop):
    """(B, T, C) -> (B, P, chunk, C) with ``chunk`` zero-padding on both
    sides (torch unfold with padding=(chunk, 0)) and hop stride."""
    x = jnp.pad(x, ((0, 0), (chunk, chunk), (0, 0)))
    moved = jnp.moveaxis(x, 1, -1)  # (B, C, T+2c)
    frames = frame_signal(moved, chunk, hop)  # (B, C, P, chunk)
    return frames.transpose(0, 2, 3, 1)  # (B, P, chunk, C)


def _unchunk(chunks, chunk, hop, out_len):
    """Inverse of ``_chunk`` (overlap-add, normalized by chunk/hop)."""
    moved = chunks.transpose(0, 3, 1, 2)  # (B, C, P, chunk)
    folded = overlap_add(moved, hop, out_len + 2 * chunk)
    folded = folded[..., chunk:chunk + out_len] / (chunk / hop)
    return jnp.moveaxis(folded, 1, -1)  # (B, T, C)


class _ChannelAttention(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        fc = nn.Sequential([
            nn.Dense(self.channels // 2), nn.relu,
            nn.Dense(self.channels),
        ])
        attn_max = fc(x.max(axis=1))
        attn_avg = fc(x.mean(axis=1))
        gate = jax.nn.sigmoid(attn_max + attn_avg)[:, None, :]
        return x * gate


class _GlobalAttention(nn.Module):
    """Multi-head self-attention across chunks (tokens = chunks,
    features = intra-chunk samples)."""

    n_head: int
    d_model: int

    @nn.compact
    def __call__(self, x):
        # x: (B', P, C=d_model)
        d_k = self.d_model * self.n_head
        b, p, _ = x.shape
        q = nn.Dense(self.n_head * d_k, use_bias=False, name='wq')(x)
        k = nn.Dense(self.n_head * d_k, use_bias=False, name='wk')(x)
        v = nn.Dense(self.n_head * d_k, use_bias=False, name='wv')(x)

        def heads(z):
            return z.reshape(b, p, self.n_head, d_k).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum('bhpd,bhqd->bhpq', q / d_k**0.5, k), axis=-1)
        out = jnp.einsum('bhpq,bhqd->bhpd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, p, -1)
        return nn.Dense(self.d_model, use_bias=False, name='fc')(out)


class _LocalAttention(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train=False):
        # x: (B, P, chunk, C_inter)  [reference: (B, N/3, P, C) chunks]
        b, p, chunk, ch = x.shape
        h = x.reshape(b * p, chunk, ch)
        # depthwise over the chunk axis per channel -> treat channels
        # as features, conv along chunk
        pad = (31 - 1) // 2
        h = jnp.swapaxes(h, 1, 2)  # (B*P, C, chunk)... conv over chunk
        h = jnp.swapaxes(h, 1, 2)
        h = DepthwiseConv1D(features=ch, kernel_size=31,
                            padding=(pad, pad), use_bias=False,
                            name='depthwise')(h)
        h = batch_norm_act(h, train, 'dw_bn', act='silu')
        # stats over channels -> (B*P, chunk, 2)
        pooled = jnp.stack([h.max(axis=-1), h.mean(axis=-1)], axis=-1)
        gate = _BasicConv(1, kernel=7, padding=3, relu=False,
                          name='gate_conv')(pooled, train)
        gate = jax.nn.sigmoid(gate)  # (B*P, chunk, 1)
        gate = gate.reshape(b, p, chunk, 1)
        return x * gate


class _MultiviewAttention(nn.Module):
    channels: int
    segment_len: int
    head: int

    @nn.compact
    def __call__(self, x, train=False):
        # x: (B, T, C)
        inter = self.channels // 3
        chunk = self.segment_len
        hop = chunk // 2
        b, t, _ = x.shape

        x0 = _BasicConv(inter, name='in0')(x, train)
        x1 = _BasicConv(inter, name='in1')(x, train)
        x2 = _BasicConv(inter, name='in2')(x, train)

        x0 = _ChannelAttention(inter, name='channel')(x0)

        c1 = _chunk(x1, chunk, hop)  # (B, P, chunk, inter)
        p = c1.shape[1]
        tokens = c1.transpose(0, 3, 1, 2).reshape(b * inter, p, chunk)
        tokens = _GlobalAttention(self.head, chunk, name='global')(tokens)
        c1 = tokens.reshape(b, inter, p, chunk).transpose(0, 2, 3, 1)
        x1 = _unchunk(c1, chunk, hop, t)

        c2 = _chunk(x2, chunk, hop)
        c2 = _LocalAttention(inter, name='local')(c2, train)
        x2 = _unchunk(c2, chunk, hop, t)

        x0 = _BasicConv(inter, kernel=3, padding=1, name='out0')(x0, train)
        x1 = _BasicConv(inter, kernel=3, padding=1, name='out1')(x1, train)
        x2 = _BasicConv(inter, kernel=3, padding=1, name='out2')(x2, train)

        out = jnp.concatenate([x0, x1, x2], axis=-1)
        out = _BasicConv(self.channels, relu=False, name='merge')(out, train)
        short = _BasicConv(self.channels, relu=False,
                           name='shortcut')(x, train)

        gated = jnp.tanh(nn.Conv(self.channels, (1,), name='gate_tanh')(out)) \
            * jax.nn.sigmoid(
                nn.Conv(self.channels, (1,), name='gate_sig')(out))
        out = nn.relu(nn.Conv(self.channels, (1,), name='gate_out')(gated))
        return short + out


class _MannerModule(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    hidden: int = 60
    depth: int = 4
    kernel_size: int = 8
    stride: int = 4
    growth: int = 2
    head: int = 1
    segment_len: int = 64
    eps: float = 1e-3
    #: space-to-depth packing of the two full-resolution levels (pure
    #: layout optimization — parameters and math are unchanged)
    pack: bool = True

    def _padded_length(self, length):
        for _ in range(self.depth):
            length = math.ceil((length - self.kernel_size) / self.stride) + 1
            length = max(length, 1)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel_size
        return int(math.ceil(length))

    @nn.compact
    def __call__(self, x, train=False):
        # x: (B, 1, samples) -> (B, samples, 1) channels-last
        # input std in f32 (a 64k-sample reduction is too coarse in
        # bf16); identity under f32
        std = jnp.std(x.astype(jnp.float32).mean(axis=1, keepdims=True),
                      axis=-1, keepdims=True)
        x = x / (self.eps + std.astype(x.dtype))
        length = x.shape[-1]
        pad = self._padded_length(length) - length
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        h = jnp.swapaxes(x, 1, 2)  # (B, T, 1)

        # the two full-resolution levels run space-to-depth packed (see
        # the module docstring above) — every tensor below carries
        # (time/2, 2*channels) until the level-2 boundary
        pk = self.pack
        if pk:
            b, t, _ = h.shape
            h = h.reshape(b, t // 2, 2)  # pack Cin=1
            h = _PConv(self.hidden, 3, padding=1, name='in_conv')(h)
            h = packed_batch_norm(h, train, 'in_bn', act='relu')
        else:
            h = nn.Conv(self.hidden, (3,), padding=((1, 1),),
                        name='in_conv')(h)
            h = batch_norm_act(h, train, 'in_bn', act='relu')
        enc_out = h

        in_ch = self.in_channels * self.hidden
        out_ch = self.out_channels * self.growth
        enc_channels = []
        skips = []
        for layer in range(self.depth):
            # encoder layer: strided down conv + ResCon (+ attention at
            # the deepest layer)
            if pk and layer <= 1:
                h = _PConv(in_ch, self.kernel_size, self.stride,
                           out_pack=(layer == 0),
                           name=f'enc_{layer}_down')(h)
            else:
                h = nn.Conv(in_ch, (self.kernel_size,),
                            strides=(self.stride,), padding='VALID',
                            name=f'enc_{layer}_down')(h)
            lvl_pk = pk and layer == 0
            h = (packed_batch_norm if lvl_pk else batch_norm_act)(
                h, train, f'enc_{layer}_bn', act='relu')
            h = _ResConBlock(in_ch, growth1=2, growth2=2, pack=lvl_pk,
                             name=f'enc_{layer}_rescon')(h, train)
            if layer == self.depth - 1:
                h = _MultiviewAttention(
                    out_ch * self.hidden, self.segment_len, self.head,
                    name=f'enc_{layer}_attn')(h, train)
            skips.append(h)
            enc_channels.append((in_ch, out_ch * self.hidden))
            in_ch = self.hidden * 2**(layer + 1)
            out_ch *= self.growth

        hdim = self.hidden * self.growth**self.depth
        h = nn.relu(nn.Dense(hdim, use_bias=False, name='linear')(h))

        for layer in reversed(range(self.depth)):
            dec_in, dec_out = enc_channels[layer][1], enc_channels[layer][0]
            skip = skips.pop()
            h = h + skip[:, :h.shape[1], :]
            h = _ResConBlock(dec_in, growth1=2, growth2=0.5,
                             pack=(pk and layer == 0),
                             name=f'dec_{layer}_rescon')(h, train)
            # transposed conv upsampling
            if pk and layer <= 1:
                h = _PConvTranspose(dec_out, self.kernel_size,
                                    self.stride, in_pack=(layer == 0),
                                    name=f'dec_{layer}_up')(h)
                h = packed_batch_norm(h, train, f'dec_{layer}_up_bn',
                                      act='relu')
            else:
                h = nn.ConvTranspose(
                    dec_out, (self.kernel_size,), strides=(self.stride,),
                    padding='VALID', name=f'dec_{layer}_up')(h)
                h = batch_norm_act(h, train, f'dec_{layer}_up_bn',
                                   act='relu')
            if layer == self.depth - 1:
                h = _MultiviewAttention(
                    dec_out, self.segment_len, self.head,
                    name=f'dec_{layer}_attn')(h, train)

        # mask gate
        if pk:
            mask = jnp.tanh(
                _PConv(self.hidden, 1, name='mask_tanh')(h)) \
                * jax.nn.sigmoid(
                    _PConv(self.hidden, 1, name='mask_sig')(h))
            mask = nn.relu(
                _PConv(self.hidden, 1, name='mask_out')(mask))
            h = enc_out * mask
            h = _PConv(self.out_channels, 3, padding=1,
                       name='out_conv')(h)
            h = _unpack2(h)  # (B, T, 1)
        else:
            mask = jnp.tanh(
                nn.Conv(self.hidden, (1,), name='mask_tanh')(h)) \
                * jax.nn.sigmoid(nn.Conv(self.hidden, (1,),
                                         name='mask_sig')(h))
            mask = nn.relu(nn.Conv(self.hidden, (1,),
                                   name='mask_out')(mask))
            h = enc_out * mask
            h = nn.Conv(self.out_channels, (3,), padding=((1, 1),),
                        name='out_conv')(h)
        out = jnp.swapaxes(h, 1, 2)[..., :length]
        return std * out


@ModelRegistry.register('manner')
class MANNER(BreverBaseModel):
    """No CLI-tunable hyperparameters, like the reference (its vendored
    argparse config is parsed with an empty argv)."""

    def __init__(self):
        super().__init__()
        # measured on v5e: whole-trunk packing regresses (158.8 ->
        # 186.4 ms/step) — some packed convs lower worse than the lane
        # padding they save; default off until the per-op profile
        # isolates the win subset (see PERF.md)
        self.module = _MannerModule(
            pack=os.environ.get('BREVER_MANNER_PACK', '0') == '1')
        self.learning_rate = 1e-5
        self.max_lr = 1e-3
        self.loss_type = 'l1'
        self.stft_loss_factors = (0.5, 0.5)  # sc, mag
        self.stft_losses = [
            STFT(frame_length=win, hop_length=hop, n_fft=fft,
                 window='hann', center=True, pad_mode='reflect',
                 normalized=False)
            for fft, hop, win in
            [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]
        ]
        self._schedule = None

    def init_variables(self, rng):
        def init(rng):
            x = jnp.zeros((1, 1, 1024), jnp.float32)
            variables = dict(self.module.init(rng, x, train=False))
            variables['params'] = self._rescale(variables['params'])
            return variables
        return self._jit_init(init, rng)

    @staticmethod
    def _rescale(params, reference=0.1):
        """Upstream ``rescale_module``: every conv kernel (and its bias)
        divided by sqrt(std / reference)."""

        def walk(tree):
            out = {}
            for key, value in tree.items():
                if isinstance(value, dict):
                    if 'kernel' in value and value['kernel'].ndim == 3:
                        std = value['kernel'].std()
                        scale = jnp.sqrt(std / reference)
                        new = {'kernel': value['kernel'] / scale}
                        if 'bias' in value:
                            new['bias'] = value['bias'] / scale
                        out[key] = {**value, **new}
                    else:
                        out[key] = walk(value)
                else:
                    out[key] = value
            return out

        return walk(params)

    def prepare_optimizer(self, steps_per_epoch, epochs):
        import optax
        self._schedule = optax.cosine_onecycle_schedule(
            transition_steps=max(steps_per_epoch * epochs, 1),
            peak_value=self.max_lr,
        )

    def optimizer(self):
        import optax
        lr = self._schedule if self._schedule is not None \
            else self.learning_rate
        return optax.adam(lr)

    def transform(self, sources):
        return sources.mean(axis=-2)  # binaural -> monaural

    # ------------------------------------------------------------------

    def _base_loss(self, x, y):
        """L1 (or Charbonnier) per item, mean over time."""
        if self.loss_type == 'ch':
            return jnp.sqrt((x - y)**2 + 1e-6).mean(axis=-1)
        return jnp.abs(x - y).mean(axis=-1)

    def _mrstft_loss(self, x, y):
        """Per-item multi-resolution spectral convergence + log-mag L1."""
        sc_total, mag_total = 0.0, 0.0
        for stft in self.stft_losses:
            x_mag = jnp.sqrt(jnp.clip(jnp.abs(stft(x))**2, min=1e-7))
            y_mag = jnp.sqrt(jnp.clip(jnp.abs(stft(y))**2, min=1e-7))
            sc = jnp.sqrt(((y_mag - x_mag)**2).sum(axis=(-2, -1))) \
                / jnp.sqrt((y_mag**2).sum(axis=(-2, -1)))
            mag = jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)) \
                .mean(axis=(-2, -1))
            sc_total = sc_total + sc
            mag_total = mag_total + mag
        n = len(self.stft_losses)
        sc_f, mag_f = self.stft_loss_factors
        return sc_f * sc_total / n + mag_f * mag_total / n

    def loss(self, variables, batch, lengths, rng, train=True):
        mono = self.transform(batch)            # (B, 2, samples)
        mix, clean = mono[:, :1], mono[:, 1]
        noise = mix[:, 0] - clean
        if train:
            clean_est, updates = self.module.apply(
                variables, mix, train=True, mutable=['batch_stats'])
        else:
            clean_est = self.module.apply(variables, mix, train=False)
            updates = None
        clean_est = clean_est[:, 0]
        noise_est = mix[:, 0] - clean_est

        loss_c = self._base_loss(clean, clean_est)
        loss_n = self._base_loss(noise, noise_est)
        loss_c = loss_c + self._mrstft_loss(clean_est, clean)
        loss_n = loss_n + self._mrstft_loss(noise_est, noise)

        # energy weighting between the clean and noise estimates
        e_clean = (clean**2).sum(axis=-1)
        e_noise = (noise**2).sum(axis=-1)
        a = e_clean / (e_clean + e_noise + 2e-7)
        per_item = a * loss_c + (1 - a) * loss_n

        if train:
            return per_item, {'batch_stats': updates['batch_stats']}
        return per_item

    def _enhance(self, variables, x):
        mono = x.mean(axis=-2, keepdims=True)   # (B, 1, samples)
        out = self.module.apply(variables, mono, train=False)
        return out[:, 0]
