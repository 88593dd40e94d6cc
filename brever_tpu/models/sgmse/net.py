"""Diffusion U-Net: union of NCSN++ and ADM for speech enhancement.

Behavioral reference: brever/models/sgmse/net.py:12-557 (itself a
cleanup of sp-uhh/sgmse, yang-song/score_sde and NVlabs/edm). Supports
``standard``/``residual``/``skip`` encoder and decoder auxiliary paths
and ``ncsn``/``adm`` block types; the default SGMSE+ configuration
(skip/skip/ncsn) carries 65,590,694 trainable parameters (pinned).

TPU design: channels-last ``(batch, freq, frames, channels)`` so every
3x3 conv maps to MXU convolutions with lane-aligned channels; the FIR
resampler's odd-shape padding stack is trace-time state; attention is
single-head over the flattened (freq x frames) grid, batched matmuls.
The Fourier noise-embedding table is a non-trainable ``buffers``
collection.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.normalization import group_norm_silu
from ...ops.resampling import Resampler


class _GNParams(nn.Module):
    """Owns the GroupNorm affine params under the same tree path
    (``.../GroupNorm_0/{scale,bias}``) as the ``nn.GroupNorm`` child
    this module replaced — checkpoints stay loadable."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param('scale', nn.initializers.ones, (self.channels,))
        bias = self.param('bias', nn.initializers.zeros, (self.channels,))
        return scale, bias


class GroupNorm(nn.Module):
    """GroupNorm with the EDM group-count rule min(32, C // 4), fused
    with the optional conditioning affine and SiLU through the
    memory-lean custom VJP (:func:`...ops.normalization.group_norm_silu`
    — residuals are the input + O(B*C) statistics instead of the full
    pre-activation stash)."""

    channels: int
    eps: float = 1e-6
    silu: bool = False

    @nn.compact
    def __call__(self, x, ext_scale=None, ext_shift=None):
        groups = min(32, self.channels // 4)
        scale, bias = _GNParams(self.channels, name='GroupNorm_0')()
        return group_norm_silu(
            x, scale, bias, groups, self.eps,
            ext_scale=ext_scale, ext_shift=ext_shift, apply_silu=self.silu)


class NoiseEmbedding(nn.Module):
    """Gaussian Fourier features + 2-layer MLP (both SiLU here)."""

    noise_channels: int
    emb_channels: int
    fourier_scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.variable(
            'buffers', 'fourier_freqs',
            lambda: jax.random.normal(
                self.make_rng('params'), (self.noise_channels // 2,)
            ) * self.fourier_scale,
        ).value
        in_dtype = x.dtype
        x = x.reshape(-1).astype(jnp.float32)
        # angles/sin/cos in f32 (the 'buffers' freqs stay f32 under
        # amp); cast the features so the MLP + trunk keep the amp dtype
        angles = 2 * math.pi * x[:, None] * freqs[None, :]
        h = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1) \
            .astype(in_dtype)
        h = nn.silu(nn.Dense(self.emb_channels, name='linear_1')(h))
        h = nn.silu(nn.Dense(self.emb_channels, name='linear_2')(h))
        return h


class AttentionBlock(nn.Module):
    """Single-head self-attention over the (freq, frames) grid."""

    channels: int

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C)
        batch, freqs, frames, ch = x.shape
        h = GroupNorm(ch, name='norm')(x)
        q = nn.Dense(ch, name='query')(h).reshape(batch, -1, ch)
        k = nn.Dense(ch, name='key')(h).reshape(batch, -1, ch)
        v = nn.Dense(ch, name='value')(h).reshape(batch, -1, ch)
        weights = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', q, k / ch**0.5), axis=-1)
        attn = jnp.einsum('bqk,bkc->bqc', weights, v)
        attn = attn.reshape(batch, freqs, frames, ch)
        return x + nn.Dense(ch, name='out')(attn)


class UNetBlock(nn.Module):
    """Residual block with noise conditioning and optional resampling/
    attention (reference net.py:367-412)."""

    in_channels: int
    out_channels: int
    block_type: str
    skip_scale: float
    dropout: float
    attention: bool = False
    up_or_down: str = 'none'

    @nn.compact
    def __call__(self, x, emb, resampler=None, deterministic=True):
        h = GroupNorm(self.in_channels, silu=True, name='norm_1')(x)
        if resampler is not None:
            h = resampler(h, self.up_or_down)
            x = resampler(x, self.up_or_down)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name='conv_1')(h)
        emb_dim = self.out_channels * (2 if self.block_type == 'adm' else 1)
        e = nn.Dense(emb_dim, name='linear')(emb)[:, None, None, :]
        if self.block_type == 'adm':
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm(self.out_channels, silu=True, name='norm_2')(
                h, ext_scale=scale + 1, ext_shift=shift)
        else:
            h = GroupNorm(self.out_channels, silu=True,
                          name='norm_2')(h + e)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name='conv_2')(h)
        if self.in_channels != self.out_channels or (
                self.block_type == 'ncsn' and resampler is not None):
            x = nn.Dense(self.out_channels, name='skip_conv')(x)
        x = self.skip_scale * (x + h)
        if self.attention:
            x = self.skip_scale * AttentionBlock(
                self.out_channels, name='attn')(x)
        return x


def _block(remat, **kwargs):
    """UNetBlock, rematerialized when it has no resampler.

    Remat halves peak HBM for diffusion training (activations of the
    two 3x3 convs per block dominate); blocks that resample are left
    unrematerialized because the FIR resampler's odd-shape padding
    stack is trace-time state that must not be replayed.
    """
    cls = nn.remat(UNetBlock, static_argnums=(2, 3)) if remat \
        else UNetBlock
    return cls(**kwargs)


class DiffusionUNet(nn.Module):
    num_freqs: int
    base_channels: int = 128
    channel_mult: tuple = (1, 1, 2, 2, 2, 2, 2)
    num_blocks_per_res: int = 2
    noise_channel_mult: int = 2
    emb_channel_mult: int = 4
    fir_kernel: tuple = (1, 3, 3, 1)
    attn_resolutions: tuple = (16,)
    attn_bottleneck: bool = True
    encoder_type: str = 'skip'
    decoder_type: str = 'skip'
    block_type: str = 'ncsn'
    skip_scale: float = 0.5**0.5
    dropout: float = 0.0
    aux_out_channels: int = 4
    in_channels: int = 4
    out_channels: int = 2
    # remat halves peak HBM; small-batch bf16 runs that fit
    # without it avoid the recompute bytes (cf. tfgridnet)
    remat: bool = True

    @nn.compact
    def __call__(self, x, sigma, deterministic=True):
        # x: (B, F, T, in_channels)
        assert self.encoder_type in ('standard', 'residual', 'skip')
        assert self.decoder_type in ('standard', 'residual', 'skip')
        assert self.block_type in ('ncsn', 'adm')

        resampler = Resampler(self.fir_kernel, buffer_padding=True,
                              data_format='NHWC')
        num_res = len(self.channel_mult)
        channels = [self.base_channels * m for m in self.channel_mult]

        emb = NoiseEmbedding(
            self.base_channels * self.noise_channel_mult,
            self.base_channels * self.emb_channel_mult,
            name='emb',
        )(sigma)

        aux = x
        x = nn.Conv(self.base_channels, (3, 3), padding=1,
                    name='input_conv')(x)
        skips = [x]
        skip_channels = [self.base_channels]

        # ------------------------------------------------------- encoder
        for i in range(num_res):
            in_ch = self.base_channels if i == 0 else channels[i - 1]
            has_resample = i != num_res - 1
            n_blocks = self.num_blocks_per_res + (1 if has_resample else 0)
            attention = (self.num_freqs >> i) in self.attn_resolutions
            for b in range(n_blocks):
                is_down = has_resample and b == n_blocks - 1
                x = _block(
                    self.remat and not is_down,
                    in_channels=in_ch if b == 0 else channels[i],
                    out_channels=channels[i],
                    block_type=self.block_type,
                    skip_scale=self.skip_scale,
                    dropout=self.dropout,
                    attention=False if is_down else attention,
                    up_or_down='down' if is_down else 'none',
                    name=f'enc_{i}_{b}',
                )(x, emb, resampler if is_down else None, deterministic)
                skip_channels.append(channels[i])
                if b != n_blocks - 1:
                    skips.append(x)
            if self.encoder_type != 'standard' and i != num_res - 1:
                aux = resampler.down(aux)
                if self.encoder_type == 'skip':
                    x = x + nn.Dense(channels[i],
                                     name=f'aux_down_{i}')(aux)
                else:  # residual
                    x = x + nn.Conv(channels[i], (3, 3), padding=1,
                                    name=f'aux_down_{i}')(aux)
                    aux = x = x * self.skip_scale
            skips.append(x)

        # ---------------------------------------------------- bottleneck
        x = _block(
            self.remat,
            in_channels=channels[-1], out_channels=channels[-1],
            block_type=self.block_type, skip_scale=self.skip_scale,
            dropout=self.dropout, attention=self.attn_bottleneck,
            name='bottleneck_1',
        )(x, emb, None, deterministic)
        x = _block(
            self.remat,
            in_channels=channels[-1], out_channels=channels[-1],
            block_type=self.block_type, skip_scale=self.skip_scale,
            dropout=self.dropout,
            name='bottleneck_2',
        )(x, emb, None, deterministic)

        # ------------------------------------------------------- decoder
        aux = None
        for i in reversed(range(num_res)):
            in_ch = channels[i] if i == num_res - 1 else channels[i + 1]
            has_resample = i != num_res - 1
            attention = (self.num_freqs >> i) in self.attn_resolutions
            n_blocks = self.num_blocks_per_res + 1
            if has_resample:
                x = _block(
                    False,
                    in_channels=in_ch, out_channels=in_ch,
                    block_type=self.block_type,
                    skip_scale=self.skip_scale, dropout=self.dropout,
                    up_or_down='up',
                    name=f'dec_{i}_up',
                )(x, emb, resampler, deterministic)
            for b in range(n_blocks):
                skip = skips.pop()
                skip_ch = skip_channels.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = _block(
                    self.remat,
                    in_channels=skip_ch
                    + (in_ch if b == 0 else channels[i]),
                    out_channels=channels[i],
                    block_type=self.block_type,
                    skip_scale=self.skip_scale, dropout=self.dropout,
                    attention=attention and (
                        self.block_type == 'adm' or b == n_blocks - 1),
                    name=f'dec_{i}_{b}',
                )(x, emb, None, deterministic)
            if self.decoder_type != 'standard':
                if i != num_res - 1:
                    aux = resampler.up(aux) if aux is not None else None
                if self.decoder_type == 'skip' or i == num_res - 1:
                    h = GroupNorm(channels[i], silu=True,
                                  name=f'aux_up_norm_{i}')(x)
                    out_ch = self.aux_out_channels \
                        if self.decoder_type == 'skip' else channels[i]
                    h = nn.Conv(out_ch, (3, 3), padding=1,
                                name=f'aux_up_conv_{i}')(h)
                    aux = h if aux is None else aux + h
                else:  # residual
                    x = aux = x + nn.Conv(channels[i], (3, 3), padding=1,
                                          name=f'aux_up_conv_{i}')(aux)
        if aux is None:
            aux = x

        # --------------------------------------------------- output head
        if self.decoder_type == 'skip':
            out = nn.Dense(self.out_channels, name='output_conv')(aux)
        else:
            out = GroupNorm(aux.shape[-1], name='output_norm')(aux)
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          name='output_conv')(out)
        return out
