"""DCCRN: deep complex convolution recurrent network (Hu et al. 2020).

Complex U-Net over the STFT (frame 512, hop 128): complex conv encoder,
complex LSTM bottleneck, complex transposed-conv decoder with skip
connections, polar mask with tanh-bounded magnitude. Behavioral
reference: brever/models/dccrn/dccrn.py:28-358 (default geometry:
3,671,053 trainable parameters, pinned).

TPU design: channels-last (batch, freq, frames, 2*C) with the real
parts in the first C channels; complex conv arithmetic is two real
convs combined (MXU work); the complex LSTM uses the scan-based LSTM
from models.rnn with the input projection hoisted out of the scan.
torch-style double biases keep parameter-count parity.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import STFT
from .base import BreverBaseModel, ModelRegistry, param_dtype
from .common import ComplexBatchNorm, PReLU, batch_norm
from .rnn import DEFAULT_UNROLL, _dispatch_scan_x


def _split(x, axis=-1):
    return jnp.split(x, 2, axis=axis)


class _ConvParams(nn.Module):
    """Parameter-only twin of ``nn.Conv``: same names ('kernel',
    'bias'), shapes and initializers, so the variable tree (and any
    checkpoint) is identical to a real ``nn.Conv`` submodule."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(), self.kernel_shape)
        bias = self.param(
            'bias', nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _ComplexConv(nn.Module):
    """Complex conv ``(a+ib)(W_r+iW_i)`` as ONE real conv.

    The naive form is four real convs (each reading both halves of the
    input).  On TPU the model is HBM-bound, and the per-conv matmul is
    narrow (N = features <= 128), so instead the complex product is a
    single conv against the block kernel ``[[W_r, W_i], [-W_i, W_r]]``
    over the stacked (real|imag) channel axis: the input is read once,
    and the lowered matmul has 2x the K and N extent — better MXU
    tiling at these channel counts.  Parameter tree matches the
    two-``nn.Conv`` form exactly ('real'/'imag' x 'kernel'/'bias')."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: tuple
    transpose: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2
        kshape = (*self.kernel_size, cin, self.features)
        wr, br = _ConvParams(kshape, self.features, name='real')()
        wi, bi = _ConvParams(kshape, self.features, name='imag')()
        kernel = jnp.concatenate([
            jnp.concatenate([wr, wi], axis=-1),   # applied to x_real
            jnp.concatenate([-wi, wr], axis=-1),  # applied to x_imag
        ], axis=-2)  # (*k, 2*cin, 2*features) -> out = [out_r | out_i]
        # torch-style double bias: each real conv adds its own bias, so
        # out_r = (Wr x_r + b_r) - (Wi x_i + b_i) etc.
        bias = jnp.concatenate([br - bi, br + bi])
        dn = ('NHWC', 'HWIO', 'NHWC')
        if self.transpose:
            y = jax.lax.conv_transpose(
                x, kernel, strides=self.strides, padding=self.padding,
                dimension_numbers=dn)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=self.strides,
                padding=self.padding, dimension_numbers=dn)
        return y + bias


class _LSTMParams(nn.Module):
    """Parameter-only twin of ``rnn.LSTM``: same names, shapes and
    initializers (so the variable tree, init draws and checkpoints are
    identical to a real LSTM submodule), but the scan itself is driven
    by the caller — _ComplexLSTMLayer packs two weight sets into ONE
    direction-stacked scan."""

    in_features: int
    hidden_size: int

    @nn.compact
    def __call__(self):
        h = self.hidden_size
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      -scale, scale)

        w_ih = self.param('w_ih', uniform_init, (self.in_features, 4 * h))
        w_hh = self.param('w_hh', uniform_init, (h, 4 * h))
        b_ih = self.param('b_ih', uniform_init, (4 * h,))
        b_hh = self.param('b_hh', uniform_init, (4 * h,))
        return w_ih, w_hh, b_ih + b_hh


class _ComplexLSTMLayer(nn.Module):
    """Single complex LSTM layer: four real LSTM passes combined into
    ONE scan.

    The four passes share two weight sets (real-net, imag-net). The
    real and imaginary inputs are stacked into the row axis (2B rows)
    and the two nets are stacked on the direction axis of the packed
    scan (the same mechanism BLSTM uses for forward/backward weights),
    so the whole complex layer is a single sequential scan — one
    kernel dispatch / while-loop instead of two, and on TPU the fused
    Pallas scan keeps the (T, 2, 2B, 4H) gate stashes in VMEM
    (reference four-pass formulation: brever/models/dccrn/dccrn.py:
    315-358)."""

    hidden_size: int

    @nn.compact
    def __call__(self, real, imag):
        batch = real.shape[0]
        stacked = jnp.concatenate([real, imag], axis=0)  # (2B, T, F)
        w_r, whh_r, b_r = _LSTMParams(
            stacked.shape[-1], self.hidden_size, name='real')()
        w_i, whh_i, b_i = _LSTMParams(
            stacked.shape[-1], self.hidden_size, name='imag')()
        xs = jnp.swapaxes(stacked, 0, 1)                  # (T, 2B, F)
        xs = jnp.broadcast_to(
            xs[:, None], (xs.shape[0], 2) + xs.shape[1:])
        out = _dispatch_scan_x(
            xs, jnp.stack([w_r, w_i]), jnp.stack([b_r, b_i]),
            jnp.stack([whh_r, whh_i]), DEFAULT_UNROLL)    # (T, 2, 2B, H)
        out_r = jnp.swapaxes(out[:, 0], 0, 1)             # (2B, T, H)
        out_i = jnp.swapaxes(out[:, 1], 0, 1)
        rr, ri = out_r[:batch], out_r[batch:]
        ir, ii = out_i[:batch], out_i[batch:]
        return rr - ii, ri + ir


class _DCCRNModule(nn.Module):
    n_freqs: int          # frame_length // 2 (DC removed)
    channels: tuple
    kernel_size: tuple
    stride: tuple
    padding: tuple
    output_padding: tuple
    lstm_channels: int
    lstm_layers: int
    complex_batchnorm: bool = False

    def _norm(self, name):
        if self.complex_batchnorm:
            return lambda h, train: ComplexBatchNorm(name=name)(
                h, train=train)
        return lambda h, train: batch_norm(
            h, train, name, momentum=0.9, epsilon=1e-5)

    @nn.compact
    def __call__(self, x, train=False):
        # x: (batch, freq, frames, 2) — real|imag stacked on channels
        kf, kt = self.kernel_size
        sf, st = self.stride
        pf, pt = self.padding
        opf, opt_ = self.output_padding

        enc_pad = ((pf, pf), (pt, pt))
        # transposed conv padding for lax.conv_transpose semantics:
        # lo = k-1-p, hi = k-1-p+output_padding per spatial dim
        dec_pad = (
            (kf - 1 - pf, kf - 1 - pf + opf),
            (kt - 1 - pt, kt - 1 - pt + opt_),
        )

        skips = []
        h = x
        for i, ch in enumerate(self.channels):
            h = _ComplexConv(
                features=ch, kernel_size=(kf, kt), strides=(sf, st),
                padding=enc_pad, name=f'enc_conv_{i}',
            )(h)
            h = self._norm(f'enc_norm_{i}')(h, train)
            h = PReLU(name=f'enc_prelu_{i}')(h)
            skips.append(h)

        # complex LSTM bottleneck over (batch, frames, channels*freqs)
        batch, freqs, frames, ch2 = h.shape
        ch = ch2 // 2
        hr, hi = _split(h)
        # (B, F, T, C) -> (B, T, C*F): channel-major then freq, matching
        # the reference's (channels, freqs) flatten order
        def to_seq(v):
            return v.transpose(0, 2, 3, 1).reshape(batch, frames, ch * freqs)

        seq_r, seq_i = to_seq(hr), to_seq(hi)
        for i in range(self.lstm_layers):
            seq_r, seq_i = _ComplexLSTMLayer(
                self.lstm_channels, name=f'lstm_{i}')(seq_r, seq_i)
        seq_r = nn.Dense(ch * freqs, name='lstm_proj_real')(seq_r)
        seq_i = nn.Dense(ch * freqs, name='lstm_proj_imag')(seq_i)

        def from_seq(v):
            return v.reshape(batch, frames, ch, freqs).transpose(0, 3, 1, 2)

        h = jnp.concatenate([from_seq(seq_r), from_seq(seq_i)], axis=-1)

        for j, i in enumerate(reversed(range(len(self.channels)))):
            skip = skips[i]
            hr, hi = _split(h)
            sr, si = _split(skip)
            h = jnp.concatenate([hr, sr, hi, si], axis=-1)
            out_ch = 1 if i == 0 else self.channels[i - 1]
            h = _ComplexConv(
                features=out_ch, kernel_size=(kf, kt), strides=(sf, st),
                padding=dec_pad, transpose=True, name=f'dec_conv_{j}',
            )(h)
            if i != 0:
                h = self._norm(f'dec_norm_{j}')(h, train)
                h = PReLU(name=f'dec_prelu_{j}')(h)
        return h  # (batch, freq, frames, 2) complex mask as real|imag


@ModelRegistry.register('dccrn')
class DCCRN(BreverBaseModel):

    def __init__(
        self,
        stft_frame_length: int = 512,
        stft_hop_length: int = 128,
        stft_window: str = 'hann',
        channels: list[int] = [16, 32, 64, 128, 128, 128],
        kernel_size: tuple[int, int] = (5, 2),
        stride: tuple[int, int] = (2, 1),
        padding: tuple[int, int] = (2, 0),
        output_padding: tuple[int, int] = (1, 0),
        lstm_channels: int = 128,
        lstm_layers: int = 2,
        use_complex_batchnorm: bool = False,
        criterion: str = 'snr',
        optimizer: str = 'adam',
        learning_rate: float = 0.0001,
    ):
        super().__init__(criterion=criterion)
        self.stft = STFT(
            frame_length=stft_frame_length,
            hop_length=stft_hop_length,
            window=stft_window,
        )
        self.channels = list(channels)
        self.kernel_size = tuple(kernel_size)
        self.stride = tuple(stride)
        self.module = _DCCRNModule(
            n_freqs=stft_frame_length // 2,
            channels=tuple(channels),
            kernel_size=tuple(kernel_size),
            stride=tuple(stride),
            padding=tuple(padding),
            output_padding=tuple(output_padding),
            lstm_channels=lstm_channels,
            lstm_layers=lstm_layers,
            complex_batchnorm=use_complex_batchnorm,
        )
        self.optimizer_name = optimizer
        self.learning_rate = learning_rate
        self.grad_clip = 5.0

    @property
    def latency(self):
        """Analytic latency: STFT frame plus the decoder time lookahead
        accumulated across strided layers (reference dccrn.py:136-142)."""
        _, kt = self.kernel_size
        _, st = self.stride
        layers = len(self.channels)
        enc_dec = (kt - 1) * sum(st**i for i in range(layers))
        return self.stft.frame_length + enc_dec * self.stft.hop_length

    def init_variables(self, rng):
        def init(rng):
            x = jnp.zeros((1, 4096), jnp.float32)
            return self.module.init(rng, self._to_input(x), train=False)
        return self._jit_init(init, rng)

    def optimizer(self):
        import optax
        return getattr(optax, self.optimizer_name)(self.learning_rate)

    def transform(self, sources):
        return sources.mean(axis=-2)  # binaural -> monaural

    # ------------------------------------------------------------------

    def _to_input(self, x):
        """Waveform -> (batch, freq-1, frames, 2) real/imag, DC removed."""
        spec = self.stft(x)[..., 1:, :]
        return jnp.stack([spec.real, spec.imag], axis=-1)

    def _forward(self, variables, x, train, rng=None):
        length = x.shape[-1]
        # network trunk in the (possibly bf16) amp dtype; the STFT is
        # complex64 so its real/imag parts silently promote to f32
        # otherwise (see base.param_dtype). Mask application + iSTFT
        # stay f32.
        spec = self._to_input(x.astype(jnp.float32)) \
            .astype(param_dtype(variables))
        if train:
            mask, updates = self.module.apply(
                variables, spec, train=True, mutable=['batch_stats'])
        else:
            mask = self.module.apply(variables, spec, train=False)
            updates = None
        out_spec = self._apply_mask(
            spec.astype(jnp.float32), mask.astype(jnp.float32))
        # re-pad the DC bin, back to complex (B, bins, T)
        out = jax.lax.complex(out_spec[..., 0], out_spec[..., 1])
        out = jnp.pad(out, ((0, 0), (1, 0), (0, 0)))
        wav = self.stft.backward(out)[..., :length]
        return wav, updates

    @staticmethod
    def _apply_mask(spec, mask):
        """Polar mask: tanh-bounded magnitude, additive phase."""
        in_mag = jnp.sqrt(spec[..., 0]**2 + spec[..., 1]**2)
        in_phase = jnp.arctan2(spec[..., 1], spec[..., 0])
        mask_mag = jnp.tanh(
            jnp.sqrt(mask[..., 0]**2 + mask[..., 1]**2 + 1e-7))
        mask_real = mask[..., 0] + (mask[..., 0] == 0) * 1e-7
        mask_phase = jnp.arctan2(mask[..., 1], mask_real)
        out_mag = in_mag * mask_mag
        out_phase = in_phase + mask_phase
        return jnp.stack(
            [out_mag * jnp.cos(out_phase), out_mag * jnp.sin(out_phase)],
            axis=-1)

    def loss(self, variables, batch, lengths, rng, train=True):
        mono = self.transform(batch)
        inputs, labels = mono[:, 0], mono[:, 1]
        outputs, updates = self._forward(variables, inputs, train, rng)
        per_item = self.criterion(
            outputs[:, None], labels[:, None], lengths)
        if train:
            new_aux = {'batch_stats': updates['batch_stats']}
            return per_item, new_aux
        return per_item

    def _enhance(self, variables, x):
        mono = x.mean(axis=-2)
        out, _ = self._forward(variables, mono, train=False)
        return out
