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

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import STFT
from ..ops.stft import frame_signal, overlap_add
from .base import BreverBaseModel, ModelRegistry
from .common import batch_norm


class _BasicConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    relu: bool = True
    bn: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (self.kernel,), strides=(self.stride,),
                    padding=((self.padding, self.padding),),
                    use_bias=self.use_bias, name='conv')(x)
        if self.bn:
            x = batch_norm(x, train, 'bn')
        if self.relu:
            x = nn.relu(x)
        return x


class _ResConBlock(nn.Module):
    """Residual Conformer block: PW-GLU -> depthwise -> PW, +shortcut."""

    in_channels: int
    growth1: float = 2
    growth2: float = 2
    kernel: int = 31

    @nn.compact
    def __call__(self, x, train=False):
        out1 = int(self.in_channels * self.growth1)
        out2 = int(self.in_channels * self.growth2)
        h = nn.Conv(out1, (1,), use_bias=True, name='pw1')(x)
        h = batch_norm(h, train, 'pw1_bn')
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU over channels
        pad = (self.kernel - 1) // 2
        h = nn.Conv(self.in_channels, (self.kernel,),
                    feature_group_count=self.in_channels,
                    padding=((pad, pad),), use_bias=False,
                    name='depthwise')(h)
        h = batch_norm(h, train, 'dw_bn')
        h = h * jax.nn.sigmoid(h)  # swish
        h = nn.Conv(out2, (1,), use_bias=True, name='pw2')(h)
        h = batch_norm(h, train, 'pw2_bn')
        h = h * jax.nn.sigmoid(h)
        h = _BasicConv(out2, relu=False, name='out_conv')(h, train)
        short = _BasicConv(out2, relu=False, name='shortcut')(x, train)
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
        h = nn.Conv(ch, (31,), feature_group_count=ch,
                    padding=((pad, pad),), use_bias=False,
                    name='depthwise')(h)
        h = batch_norm(h, train, 'dw_bn')
        h = h * jax.nn.sigmoid(h)
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

        h = nn.Conv(self.hidden, (3,), padding=((1, 1),),
                    name='in_conv')(h)
        h = batch_norm(h, train, 'in_bn')
        h = nn.relu(h)
        enc_out = h

        in_ch = self.in_channels * self.hidden
        out_ch = self.out_channels * self.growth
        enc_channels = []
        skips = []
        for layer in range(self.depth):
            # encoder layer: strided down conv + ResCon (+ attention at
            # the deepest layer)
            h = nn.Conv(in_ch, (self.kernel_size,),
                        strides=(self.stride,), padding='VALID',
                        name=f'enc_{layer}_down')(h)
            h = batch_norm(h, train, f'enc_{layer}_bn')
            h = nn.relu(h)
            h = _ResConBlock(in_ch, growth1=2, growth2=2,
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
                             name=f'dec_{layer}_rescon')(h, train)
            # transposed conv upsampling
            h = nn.ConvTranspose(
                dec_out, (self.kernel_size,), strides=(self.stride,),
                padding='VALID', name=f'dec_{layer}_up')(h)
            h = batch_norm(h, train, f'dec_{layer}_up_bn')
            h = nn.relu(h)
            if layer == self.depth - 1:
                h = _MultiviewAttention(
                    dec_out, self.segment_len, self.head,
                    name=f'dec_{layer}_attn')(h, train)

        # mask gate
        mask = jnp.tanh(nn.Conv(self.hidden, (1,), name='mask_tanh')(h)) \
            * jax.nn.sigmoid(nn.Conv(self.hidden, (1,),
                                     name='mask_sig')(h))
        mask = nn.relu(nn.Conv(self.hidden, (1,), name='mask_out')(mask))
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
        self.module = _MannerModule()
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
        x = jnp.zeros((1, 1, 1024), jnp.float32)
        variables = self.module.init(rng, x, train=False)
        variables = dict(variables)
        variables['params'] = self._rescale(variables['params'])
        return variables

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
