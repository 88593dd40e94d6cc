"""TF-GridNet V2: alternating sub-band/full-band BLSTMs + attention.

Wang et al., IEEE/ACM TASLP 2023 (ESPnet V2 variant). Behavioral
reference: brever/models/tfgridnet/tfgridnet.py:29-420 (default
geometry: 3,735,344 trainable parameters, pinned).

TPU design notes:
* the intra(frequency)/inter(time) BLSTMs fold the orthogonal axis into
  the batch axis (B*T rows scan over frequency, B*F rows scan over
  time) so the recurrent matmuls stay wide — the reference does the
  same reshape, here it additionally feeds the scan-based LSTM whose
  input projection is one large MXU matmul;
* full-band self-attention over frames is a plain batched matmul
  softmax (static shapes, fused by XLA);
* layout is channels-last throughout.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import STFT
from .base import BreverBaseModel, ModelRegistry, param_dtype
from .common import PReLU
from .rnn import BLSTM
from .schedulers import ReduceLROnPlateau


class _AllHeadPReLULayerNorm(nn.Module):
    """Per-head PReLU + layer norm over (embedding, frequency) with
    per-(head, embedding, freq) affine (reference
    tfgridnet.py:393-420)."""

    n_head: int
    emb: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, H*E) -> (B, H, T, F, E)
        batch, frames, freqs, _ = x.shape
        x = x.reshape(batch, frames, freqs, self.n_head, self.emb)
        x = x.transpose(0, 3, 1, 2, 4)  # (B, H, T, F, E)
        alpha = self.param(
            'alpha',
            lambda k: jnp.full((self.n_head, 1, 1, 1), 0.25,
                               jnp.float32))
        x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        gamma = self.param(
            'gamma', nn.initializers.ones,
            (self.n_head, 1, self.n_freqs, self.emb))
        beta = self.param(
            'beta', nn.initializers.zeros,
            (self.n_head, 1, self.n_freqs, self.emb))
        # stats in f32 for bf16 inputs (bf16 mean/var over F*E rows is
        # too coarse); the cast pair fuses away under f32
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(3, 4), keepdims=True)
        var = ((x32 - mean)**2).mean(axis=(3, 4), keepdims=True)
        out = ((x32 - mean) / jnp.sqrt(var + self.eps)) * gamma + beta
        return out.astype(x.dtype)


class _LayerNormCF(nn.Module):
    """Layer norm over (channel, frequency) with (channel, freq) affine
    (reference tfgridnet.py:364-390)."""

    n_channels: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C); stats over (F, C)
        gamma = self.param('gamma', nn.initializers.ones,
                           (1, 1, self.n_freqs, self.n_channels))
        beta = self.param('beta', nn.initializers.zeros,
                          (1, 1, self.n_freqs, self.n_channels))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(2, 3), keepdims=True)
        var = ((x32 - mean)**2).mean(axis=(2, 3), keepdims=True)
        out = ((x32 - mean) / jnp.sqrt(var + self.eps)) * gamma + beta
        return out.astype(x.dtype)


class _GridBlock(nn.Module):
    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int
    approx_qk_dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C)
        if self.emb_ks != self.emb_hs:
            raise NotImplementedError(
                'emb_ks != emb_hs (overlapping unfolding) is not '
                'implemented; the default configuration uses '
                'emb_ks == emb_hs')
        batch, old_t, old_f, ch = x.shape
        ks = self.emb_ks
        pad_t = -old_t % ks
        pad_f = -old_f % ks
        frames = old_t + pad_t
        freqs = old_f + pad_f
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_f), (0, 0)))

        # intra (sub-band) BLSTM: scan over frequency, B*T in batch
        h = nn.LayerNorm(epsilon=self.eps, name='intra_norm')(x)
        h = h.reshape(batch * frames, freqs // ks, ks * ch)
        h = BLSTM(self.hidden, name='intra_rnn')(h)
        h = nn.Dense(ks * ch, name='intra_linear')(h)
        h = h.reshape(batch, frames, freqs, ch)
        x = x + h

        # inter (full-band over time) BLSTM: scan over frames, B*F rows
        swapped = x.transpose(0, 2, 1, 3)  # (B, F, T, C)
        h = nn.LayerNorm(epsilon=self.eps, name='inter_norm')(swapped)
        h = h.reshape(batch * freqs, frames // ks, ks * ch)
        h = BLSTM(self.hidden, name='inter_rnn')(h)
        h = nn.Dense(ks * ch, name='inter_linear')(h)
        h = h.reshape(batch, freqs, frames, ch)
        swapped = swapped + h
        x = swapped.transpose(0, 2, 1, 3)  # (B, T, F, C)

        x = x[:, :old_t, :old_f]

        # full-band self-attention over frames
        e_qk = math.ceil(self.approx_qk_dim / self.n_freqs)
        e_v = self.emb_dim // self.n_head
        q = nn.Dense(self.n_head * e_qk, name='attn_q')(x)
        k = nn.Dense(self.n_head * e_qk, name='attn_k')(x)
        v = nn.Dense(self.n_head * e_v, name='attn_v')(x)
        q = _AllHeadPReLULayerNorm(
            self.n_head, e_qk, self.n_freqs, self.eps, name='attn_q_norm',
        )(q)
        k = _AllHeadPReLULayerNorm(
            self.n_head, e_qk, self.n_freqs, self.eps, name='attn_k_norm',
        )(k)
        v = _AllHeadPReLULayerNorm(
            self.n_head, e_v, self.n_freqs, self.eps, name='attn_v_norm',
        )(v)
        # q/k/v: (B, H, T, F, E) -> flatten (F, E) per frame
        def flat(z):
            b, heads, t, f, e = z.shape
            return z.reshape(b * heads, t, f * e)

        qf, kf, vf = flat(q), flat(k), flat(v)
        scale = qf.shape[-1]**-0.5
        attn = jax.nn.softmax(
            jnp.einsum('bte,bse->bts', qf, kf) * scale, axis=-1)
        out = jnp.einsum('bts,bse->bte', attn, vf)  # (B*H, T, F*E_v)
        out = out.reshape(batch, self.n_head, old_t, old_f, e_v)
        out = out.transpose(0, 2, 3, 1, 4).reshape(
            batch, old_t, old_f, self.n_head * e_v)

        out = nn.Dense(self.emb_dim, name='attn_proj')(out)
        out = PReLU(name='attn_prelu')(out)
        out = _LayerNormCF(
            self.emb_dim, self.n_freqs, self.eps, name='attn_out_norm',
        )(out)
        return x + out


class _GridBlockScan(nn.Module):
    """(carry, _) -> (carry, None) adapter so the identical grid
    blocks stack under ``nn.scan`` (params gain a leading n_layers
    axis; the block is traced and compiled once)."""
    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int
    approx_qk_dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, h, _):
        h = _GridBlock(
            emb_dim=self.emb_dim,
            emb_ks=self.emb_ks,
            emb_hs=self.emb_hs,
            n_freqs=self.n_freqs,
            hidden=self.hidden,
            n_head=self.n_head,
            approx_qk_dim=self.approx_qk_dim,
            eps=self.eps,
            name='block',
        )(h)
        return h, None


class _TFGridNetModule(nn.Module):
    n_srcs: int
    n_freqs: int
    n_layers: int
    hidden: int
    n_head: int
    approx_qk_dim: int
    emb_dim: int
    emb_ks: int
    emb_hs: int
    eps: float = 1e-5
    n_imics: int = 2
    remat: bool = True
    # scan_blocks=True compiles the grid block once (nn.scan with a
    # leading n_layers param axis) — the compile-budget operating
    # point. False inlines the blocks, giving XLA cross-block
    # scheduling freedom at n_layers x the compile time (measured
    # faster per step under the XLA BLSTM scan; re-A/B on the chip
    # whenever the block internals change). The two points have
    # different parameter-tree shapes, so checkpoints don't transfer.
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, spec):
        # spec: (B, T, F, 2*n_imics) real/imag per mic
        h = nn.Conv(self.emb_dim, kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)), name='embed')(spec)
        h = nn.GroupNorm(num_groups=1, epsilon=self.eps,
                         name='embed_norm')(h)
        # rematerialize each grid block: the BLSTM scans otherwise keep
        # every gate activation alive for the backward pass (measured
        # ~44 GB for batch 16 x 4 s without remat — over a v5e's HBM).
        # The recompute costs HBM traffic (the train step runs at ~98 %
        # of the bandwidth roofline), so small batches that fit without
        # remat should turn it off (module.replace(remat=False)).
        #
        # The n_layers identical blocks are folded into one nn.scan so
        # XLA traces and compiles the block ONCE (6 inlined grid
        # blocks dominated this model's compile time).
        block_kwargs = dict(
            emb_dim=self.emb_dim,
            emb_ks=self.emb_ks,
            emb_hs=self.emb_hs,
            n_freqs=self.n_freqs,
            hidden=self.hidden,
            n_head=self.n_head,
            approx_qk_dim=self.approx_qk_dim,
            eps=self.eps,
        )
        if self.scan_blocks:
            block_cls = nn.remat(_GridBlockScan) if self.remat \
                else _GridBlockScan
            blocks = nn.scan(
                block_cls,
                variable_axes={'params': 0},
                split_rngs={'params': True},
                length=self.n_layers,
            )(**block_kwargs, name='blocks')
            h, _ = blocks(h, None)
        else:
            block_cls = nn.remat(_GridBlock) if self.remat \
                else _GridBlock
            for i in range(self.n_layers):
                h = block_cls(**block_kwargs, name=f'block_{i}')(h)
        out = nn.ConvTranspose(
            self.n_srcs * 2, kernel_size=(3, 3),
            padding=((1, 1), (1, 1)), name='deconv')(h)
        return out  # (B, T, F, n_srcs*2)


@ModelRegistry.register('tfgridnet')
class TFGridNet(BreverBaseModel):

    def __init__(
        self,
        n_srcs: int = 1,
        n_fft: int = 256,
        stride: int = 128,
        window: str = 'hann',
        n_layers: int = 6,
        lstm_hidden_units: int = 128,
        attn_n_head: int = 4,
        attn_approx_qk_dim: int = 512,
        emb_dim: int = 32,
        emb_ks: int = 4,
        emb_hs: int = 4,
        activation: str = 'PReLU',
        eps: float = 1e-5,
        criterion: str = 'multiresyu',
        optimizer: str = 'adam',
        learning_rate: float = 0.001,
        grad_clip: float = 1.0,
    ):
        super().__init__(criterion=criterion)
        self.n_srcs = n_srcs
        self.stft = STFT(
            frame_length=n_fft, hop_length=stride, window=window,
            normalized=False)
        self.module = _TFGridNetModule(
            n_srcs=n_srcs,
            n_freqs=n_fft // 2 + 1,
            n_layers=n_layers,
            hidden=lstm_hidden_units,
            n_head=attn_n_head,
            approx_qk_dim=attn_approx_qk_dim,
            emb_dim=emb_dim,
            emb_ks=emb_ks,
            emb_hs=emb_hs,
            eps=eps,
        )
        self.optimizer_name = optimizer
        self.learning_rate = learning_rate
        self.grad_clip = grad_clip
        self.scheduler = ReduceLROnPlateau(
            init_lr=learning_rate, factor=0.5, patience=3)

    def init_variables(self, rng):
        def init(rng):
            x = jnp.zeros((1, 2, 2048), jnp.float32)
            return self.module.init(rng, self._to_input(x))
        return self._jit_init(init, rng)

    def optimizer(self):
        import optax
        return optax.inject_hyperparams(
            getattr(optax, self.optimizer_name)
        )(learning_rate=self.learning_rate)

    # ------------------------------------------------------------------

    def _to_input(self, x):
        """(B, 2 mics, samples) -> (B, T, F, 4) real/imag per mic."""
        spec = self.stft(x)                    # (B, M, F, T) complex
        spec = jnp.swapaxes(spec, -1, -2)      # (B, M, T, F)
        parts = jnp.concatenate([spec.real, spec.imag], axis=1)
        return parts.transpose(0, 2, 3, 1)     # (B, T, F, 2M)

    def _forward(self, variables, x):
        n_samples = x.shape[-1]
        x = x.astype(jnp.float32)
        std = jnp.std(x, axis=(1, 2), keepdims=True)
        x = x / jnp.maximum(std, 1e-8)
        # run the grid-block trunk in the (possibly bf16) param dtype:
        # the STFT is complex64, so without this cast the whole network
        # silently runs f32 even under amp — and the BLSTM scans are
        # HBM-bandwidth-bound, so activation bytes are the step time
        spec = self._to_input(x).astype(param_dtype(variables))
        out = self.module.apply(variables, spec)  # (B, T, F, 2*n_srcs)
        out = out.astype(jnp.float32)
        batch, frames, freqs, _ = out.shape
        out = out.reshape(batch, frames, freqs, self.n_srcs, 2)
        out = out.transpose(0, 3, 2, 1, 4)        # (B, S, F, T, 2)
        complex_spec = jax.lax.complex(out[..., 0], out[..., 1])
        wav = self.stft.backward(complex_spec)[..., :n_samples]
        return wav * std

    def transform(self, sources):
        return sources  # binaural input is consumed as-is

    def loss(self, variables, batch, lengths, rng, train=True):
        inputs = batch[:, 0]                    # (B, 2, samples)
        labels = batch[:, 1:].mean(axis=-2)     # channel-mean targets
        outputs = self._forward(variables, inputs)
        return self.criterion(outputs, labels, lengths)

    def _enhance(self, variables, x):
        out = self._forward(variables, x)
        if self.n_srcs == 1:
            out = out[:, 0]
        return out

    def on_validate(self, val_loss):
        value = sum(val_loss.values()) if isinstance(val_loss, dict) \
            else val_loss
        new_lr = self.scheduler.step(value)
        if new_lr is not None:
            return {'learning_rate': new_lr}
        return None

    def extra_state(self):
        return {'scheduler': self.scheduler.state_dict()}

    def load_extra_state(self, state):
        if 'scheduler' in state:
            self.scheduler.load_state_dict(state['scheduler'])
