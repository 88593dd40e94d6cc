"""Conv-TasNet: learned time-domain encoder/decoder + dilated TCN masks.

Luo & Mesgarani, IEEE/ACM TASLP 2019. Behavioral reference:
brever/models/convtasnet/convtasnet.py:20-268 (default geometry gives
4,935,217 trainable parameters, pinned by tests).

TPU design notes: channels-last layout throughout — the 1x1 convs
(bottleneck/residual/skip/output) are Dense matmuls on the MXU with
C in {128, 512} aligning to lanes; the depthwise dilated convs are VPU
work XLA fuses with the surrounding PReLU/norm. The whole forward is a
static-shape jit: encoder framing pads to an integer stride count.
"""

import os

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pallas.tcn_block import (MAX_FUSED_T, pallas_tcn_available,
                                    tcn_block_fused)
from .base import BreverBaseModel, ModelRegistry
from .common import DepthwiseConv1D, PReLU, make_norm


class _ConvBlock(nn.Module):
    """1x1 conv -> PReLU/norm -> dilated depthwise -> PReLU/norm ->
    residual + skip projections."""

    input_channels: int
    hidden_channels: int
    skip_channels: int
    kernel_size: int
    dilation: int
    causal: bool
    last: bool

    @nn.compact
    def __call__(self, x):
        # x: (batch, time, bottleneck)
        # construct submodules up front (names fixed by construction
        # order) so the fused kernel path below shares the exact same
        # parameter tree as the unfused path
        dense_in = nn.Dense(self.hidden_channels, name='conv_in')
        prelu_1 = PReLU(name='prelu_1')
        norm_1 = make_norm(self.causal)
        padding = (self.kernel_size - 1) * self.dilation
        if self.causal:
            pad = (padding, 0)
        else:
            pad = (padding // 2, padding - padding // 2)
        # shifted-multiply depthwise (same param tree as the grouped
        # nn.Conv it replaces; see DepthwiseConv1D for why)
        depthwise = DepthwiseConv1D(
            features=self.hidden_channels,
            kernel_size=self.kernel_size,
            kernel_dilation=self.dilation,
            padding=pad,
            name='depthwise',
        )
        prelu_2 = PReLU(name='prelu_2')
        norm_2 = make_norm(self.causal)
        dense_res = None if self.last \
            else nn.Dense(self.input_channels, name='res')
        dense_skip = nn.Dense(self.skip_channels, name='skip')

        # flash-TCN: recompute-from-VMEM fused kernel (TPU + bf16 amp
        # + non-causal global norm); see ops/pallas/tcn_block.py
        if (not self.causal and self.kernel_size == 3
                and x.dtype == jnp.bfloat16 and pallas_tcn_available()
                and x.shape[1] <= MAX_FUSED_T):
            # materialize the identical param tree with a tiny pass
            tiny = jnp.zeros((1, 8, x.shape[-1]), x.dtype)
            th = norm_1(prelu_1(dense_in(tiny)))
            th = norm_2(prelu_2(depthwise(th)))
            if dense_res is not None:
                dense_res(th)
            dense_skip(th)
            p = self.variables['params']
            hidden = self.hidden_channels
            if self.last:
                w_res = jnp.zeros((hidden, self.input_channels), x.dtype)
                b_res = jnp.zeros((self.input_channels,), x.dtype)
            else:
                w_res = p['res']['kernel']
                b_res = p['res']['bias']
            params = (
                p['conv_in']['kernel'], p['conv_in']['bias'],
                p['prelu_1']['alpha'],
                p['GlobalLayerNorm_0']['scale'],
                p['GlobalLayerNorm_0']['bias'],
                p['depthwise']['kernel'].reshape(3, hidden),
                p['depthwise']['bias'],
                p['prelu_2']['alpha'],
                p['GlobalLayerNorm_1']['scale'],
                p['GlobalLayerNorm_1']['bias'],
                w_res, b_res,
                p['skip']['kernel'], p['skip']['bias'],
            )
            return tcn_block_fused(x, params, self.dilation, self.last)

        h = dense_in(x)
        h = prelu_1(h)
        h = norm_1(h)
        h = depthwise(h)
        h = prelu_2(h)
        h = norm_2(h)
        residual = None if self.last else x + dense_res(h)
        skip = dense_skip(h)
        return residual, skip


class _DilationSweep(nn.Module):
    """One full dilation sweep (``layers`` blocks, residuals kept).

    The scan body for :class:`_TCN`: every repeat except the last is
    structurally identical, so the repeats are folded into one
    ``nn.scan`` — XLA traces and compiles the sweep ONCE instead of
    ``repeats`` times (the TCN dominated Conv-TasNet's compile time;
    the reference instantiates every block eagerly,
    reference brever/models/convtasnet/convtasnet.py)."""
    bottleneck_channels: int
    hidden_channels: int
    skip_channels: int
    kernel_size: int
    layers: int
    causal: bool

    @nn.compact
    def __call__(self, carry, _):
        x, skip_sum = carry
        for i in range(self.layers):
            x, skip = _ConvBlock(
                input_channels=self.bottleneck_channels,
                hidden_channels=self.hidden_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                dilation=2**i,
                causal=self.causal,
                last=False,
                name=f'block_{i}',
            )(x)
            skip_sum = skip_sum + skip
        return (x, skip_sum), None


class _TCN(nn.Module):
    input_channels: int
    bottleneck_channels: int
    hidden_channels: int
    skip_channels: int
    kernel_size: int
    layers: int
    repeats: int
    sources: int
    causal: bool

    @nn.compact
    def __call__(self, x):
        # x: (batch, time, filters)
        x = make_norm(self.causal)(x)
        x = nn.Dense(self.bottleneck_channels, name='bottleneck')(x)
        batch, time, _ = x.shape
        skip_sum = jnp.zeros((batch, time, self.skip_channels), x.dtype)
        # repeats 0..R-2 share one scanned sweep; the final repeat is
        # inlined because its last block drops the residual conv (the
        # parameter tree must match the reference's: no res weights on
        # the terminal block)
        if self.repeats > 1:
            # unroll: the scanned sweep keeps the stacked param tree
            # (checkpoints unaffected) but unrolling the while loop
            # lets XLA schedule across block boundaries — the per-op
            # profile (benchmarks/r4_measure.log, profile_convtasnet)
            # showed fwd kernels INSIDE the scan at 0.65 ms vs 0.31 ms
            # for the inlined repeat.  Overridable for compile-budget
            # experiments via BREVER_TCN_SCAN_UNROLL.
            unroll = int(os.environ.get('BREVER_TCN_SCAN_UNROLL', '1'))
            sweep = nn.scan(
                _DilationSweep,
                variable_axes={'params': 0},
                split_rngs={'params': True},
                length=self.repeats - 1,
                unroll=min(unroll, self.repeats - 1),
            )(
                bottleneck_channels=self.bottleneck_channels,
                hidden_channels=self.hidden_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                layers=self.layers,
                causal=self.causal,
                name='sweeps',
            )
            (x, skip_sum), _ = sweep((x, skip_sum), None)
        for i in range(self.layers):
            last = i == self.layers - 1
            x, skip = _ConvBlock(
                input_channels=self.bottleneck_channels,
                hidden_channels=self.hidden_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                dilation=2**i,
                causal=self.causal,
                last=last,
                name=f'block_last_{i}',
            )(x)
            skip_sum = skip_sum + skip
        out = PReLU(name='prelu_out')(skip_sum)
        out = nn.Dense(self.input_channels * self.sources, name='mask')(out)
        out = nn.sigmoid(out)
        batch, time, _ = out.shape
        return out.reshape(batch, time, self.sources, self.input_channels)


class _ConvTasNetModule(nn.Module):
    filters: int
    filter_length: int
    bottleneck_channels: int
    hidden_channels: int
    skip_channels: int
    kernel_size: int
    layers: int
    repeats: int
    sources: int
    causal: bool

    @nn.compact
    def __call__(self, x):
        # x: (batch, samples) mono waveform
        length = x.shape[-1]
        stride = self.filter_length // 2
        pad = (self.filter_length - length) % stride
        x = jnp.pad(x, ((0, 0), (0, pad)))
        encoded = nn.Conv(
            features=self.filters,
            kernel_size=(self.filter_length,),
            strides=(stride,),
            padding='VALID',
            use_bias=False,
            name='encoder',
        )(x[..., None])  # (batch, frames, filters)

        masks = _TCN(
            input_channels=self.filters,
            bottleneck_channels=self.bottleneck_channels,
            hidden_channels=self.hidden_channels,
            skip_channels=self.skip_channels,
            kernel_size=self.kernel_size,
            layers=self.layers,
            repeats=self.repeats,
            sources=self.sources,
            causal=self.causal,
            name='tcn',
        )(encoded)  # (batch, frames, sources, filters)

        masked = encoded[:, :, None, :] * masks
        batch, frames, sources, filters = masked.shape
        masked = masked.transpose(0, 2, 1, 3).reshape(
            batch * sources, frames, filters)
        decoded = nn.ConvTranspose(
            features=1,
            kernel_size=(self.filter_length,),
            strides=(stride,),
            padding='VALID',
            use_bias=False,
            name='decoder',
        )(masked)[..., 0]
        decoded = decoded.reshape(batch, sources, -1)
        return decoded[..., :length]


@ModelRegistry.register('convtasnet')
class ConvTasNet(BreverBaseModel):

    def __init__(
        self,
        filters: int = 512,
        filter_length: int = 32,
        bottleneck_channels: int = 128,
        hidden_channels: int = 512,
        skip_channels: int = 128,
        kernel_size: int = 3,
        layers: int = 8,
        repeats: int = 3,
        output_sources: int = 1,
        causal: bool = False,
        criterion: str = 'snr',
        optimizer: str = 'adam',
        learning_rate: float = 0.001,
        grad_clip: float = 5.0,
    ):
        super().__init__(criterion=criterion)
        self.module = _ConvTasNetModule(
            filters=filters,
            filter_length=filter_length,
            bottleneck_channels=bottleneck_channels,
            hidden_channels=hidden_channels,
            skip_channels=skip_channels,
            kernel_size=kernel_size,
            layers=layers,
            repeats=repeats,
            sources=output_sources,
            causal=causal,
        )
        self.filter_length = filter_length
        self.output_sources = output_sources
        self.optimizer_name = optimizer
        self.learning_rate = learning_rate
        self.grad_clip = grad_clip

    @property
    def latency(self):
        """Algorithmic latency in samples (one analysis window when
        causal)."""
        return self.filter_length

    def init_variables(self, rng):
        def init(rng):
            return self.module.init(rng, jnp.zeros((1, 512), jnp.float32))
        return self._jit_init(init, rng)

    def optimizer(self):
        import optax
        return getattr(optax, self.optimizer_name)(self.learning_rate)

    def transform(self, sources):
        """Binaural -> monaural (mean over channels)."""
        return sources.mean(axis=-2)

    def loss(self, variables, batch, lengths, rng, train=True):
        mono = self.transform(batch)      # (B, sources, samples)
        inputs, labels = mono[:, 0], mono[:, 1:]
        outputs = self.module.apply(
            {'params': variables['params']}, inputs)
        return self.criterion(outputs, labels, lengths)

    def _enhance(self, variables, x):
        mono = x.mean(axis=-2)            # (B, samples)
        out = self.module.apply({'params': variables['params']}, mono)
        if self.output_sources == 1:
            out = out[:, 0]
        return out
