"""FFNN mask estimator: mel-feature MLP predicting an IRM.

Behavioral reference: brever/models/ffnn/ffnn.py:15-203 — binaural
feature stack (context stacking + decimation) -> MLP -> sigmoid ideal
ratio mask in the mel domain, extrapolated to STFT bins through the
mel pseudo-inverse at inference. Default geometry gives 1,509,440
trainable parameters (pinned by tests, as in the reference).

TPU design: the feature ``transform`` is pure jnp and runs inside the
jitted train step (fused with the MLP by XLA) instead of in dataloader
workers; the static normalizer statistics live in a ``stats`` variable
collection computed by ``pre_train`` on device.
"""

import logging

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import STFT, FeatureExtractor, MelFilterbank
from ..utils import eps
from .base import BreverBaseModel, ModelRegistry, param_dtype


class _MLP(nn.Module):
    hidden_layers: tuple
    output_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, train=False):
        # x: (batch, features, frames) -> dense over feature axis
        x = jnp.swapaxes(x, -1, -2)
        for size in self.hidden_layers:
            x = nn.Dense(size)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.output_size)(x)
        x = nn.sigmoid(x)
        return jnp.swapaxes(x, -1, -2)


@ModelRegistry.register('ffnn')
class FFNN(BreverBaseModel):

    def __init__(
        self,
        fs: int = 16000,
        features: set[str] = {'logfbe'},
        stacks: int = 5,
        decimation: int = 1,
        stft_frame_length: int = 512,
        stft_hop_length: int = 256,
        stft_window: str = 'hann',
        mel_filters: int = 64,
        hidden_layers: list[int] = [1024, 1024],
        dropout: float = 0.2,
        normalization: str = 'static',
        criterion: str = 'mse',
        optimizer: str = 'adam',
        learning_rate: float = 0.0001,
    ):
        super().__init__(criterion=criterion)
        self.fs = fs
        self.stacks = stacks
        self.decimation = decimation
        self.stft = STFT(
            frame_length=stft_frame_length,
            hop_length=stft_hop_length,
            window=stft_window,
        )
        self.mel_fb = MelFilterbank(
            n_filters=mel_filters, n_fft=stft_frame_length, fs=fs)
        self.feature_extractor = FeatureExtractor(
            features=features, mel_fb=self.mel_fb,
            hop_length=stft_hop_length, fs=fs)
        self.input_size = self.feature_extractor.n_features * (stacks + 1)
        self.output_size = mel_filters
        if normalization not in ('static', 'cumulative'):
            raise ValueError('unrecognized normalization type, got '
                             f'{normalization}')
        self.normalization = normalization
        self.module = _MLP(
            hidden_layers=tuple(hidden_layers),
            output_size=mel_filters,
            dropout=dropout,
        )
        self.optimizer_name = optimizer
        self.learning_rate = learning_rate

    # ------------------------------------------------------------------

    def init_variables(self, rng):
        def init(rng):
            x = jnp.zeros((1, self.input_size, 8), jnp.float32)
            variables = self.module.init(rng, x)
            return {
                'params': variables['params'],
                'stats': {
                    'mean': jnp.zeros((self.input_size, 1)),
                    'std': jnp.ones((self.input_size, 1)),
                },
            }
        return self._jit_init(init, rng)

    def optimizer(self):
        import optax
        return getattr(optax, self.optimizer_name)(self.learning_rate)

    # ------------------------------------------------------------------

    def transform(self, sources):
        """(…, 2 sources, channels, samples) -> features+IRM labels."""
        unbatched = sources.ndim == 3
        if unbatched:
            sources = sources[None]
        spec = self.stft(sources)           # (B, S, C, bins, T)
        mix = spec[:, 0]
        foreground = spec[:, 1]
        background = mix - foreground
        feats = self.feature_extractor(mix)  # (B, F, T)
        feats = self.stack(feats)
        feats = self.decimate(feats)
        labels = self.irm(jnp.abs(foreground), jnp.abs(background))
        labels = self.decimate(labels)
        out = jnp.concatenate([feats, labels], axis=-2)
        return out[0] if unbatched else out

    def irm(self, foreground_mag, background_mag):
        fg = self.mel_fb((foreground_mag**2).mean(axis=-3))
        bg = self.mel_fb((background_mag**2).mean(axis=-3))
        return (1 + bg / (fg + eps))**-0.5

    def stack(self, feats):
        """Append ``stacks`` past-context copies along the feature axis."""
        parts = [feats]
        for i in range(self.stacks):
            shifted = jnp.roll(feats, i + 1, axis=-1)
            # first i+1 frames have no past context; repeat frame 0
            shifted = jnp.concatenate([
                jnp.repeat(feats[..., :1], i + 1, axis=-1),
                shifted[..., i + 1:],
            ], axis=-1)
            parts.append(shifted)
        return jnp.concatenate(parts, axis=-2)

    def decimate(self, x):
        return x[..., ::self.decimation]

    def normalize(self, variables, x):
        if self.normalization == 'static':
            stats = variables['stats']
            return (x - stats['mean']) / stats['std']
        # cumulative
        count = jnp.arange(1, x.shape[-1] + 1, dtype=x.dtype)
        cum_mean = jnp.cumsum(x, axis=-1) / count
        cum_var = jnp.cumsum(x**2, axis=-1) / count - cum_mean**2
        return (x - cum_mean) / jnp.sqrt(cum_var + 1e-4)

    # ------------------------------------------------------------------

    def loss(self, variables, batch, lengths, rng, train=True):
        data = self.transform(batch)    # (B, F_in + F_lab, T)
        inputs = data[:, :self.input_size]
        labels = data[:, self.input_size:]
        inputs = self.normalize(variables, inputs)
        # dense trunk in the (possibly bf16) amp dtype: the feature
        # front-end is f32 (complex STFT), see base.param_dtype
        inputs = inputs.astype(param_dtype(variables))
        outputs = self.module.apply(
            {'params': variables['params']}, inputs, train=train,
            rngs={'dropout': rng} if train else {},
        ).astype(jnp.float32)
        frame_lengths = self.frame_count(
            lengths, self.stft.frame_length, self.stft.hop_length)
        frame_lengths = jnp.ceil(frame_lengths / self.decimation)
        frame_lengths = jnp.where(lengths > 0, frame_lengths, 0) \
            .astype(jnp.int32)
        return self.criterion(outputs, labels, frame_lengths)

    def _enhance(self, variables, x):
        length = x.shape[-1]
        spec = self.stft(x)                       # (B, 2, bins, T)
        feats = self.feature_extractor(spec)
        feats = self.stack(feats)
        feats = self.normalize(variables, feats)
        mask = self.module.apply(
            {'params': variables['params']}, feats, train=False)
        mask_full = self.mel_fb.backward(mask)     # (B, bins, T)
        mono = spec.mean(axis=1)
        out = self.stft.backward(mono * mask_full)
        return out[..., :length]

    # ------------------------------------------------------------------

    def pre_train(self, variables, dataset, dataloader, epochs):
        """Static normalizer statistics: mean of per-item feature means
        over the training set (reference ffnn.py:137-148), computed in
        batches on device."""
        if self.normalization != 'static':
            return variables
        logging.info('Calculating training statistics')

        @jax.jit
        def batch_stats(batch, lengths):
            data = self.transform(batch)
            inputs = data[:, :self.input_size]
            frames = self.frame_count(
                lengths, self.stft.frame_length, self.stft.hop_length)
            frames = jnp.ceil(frames / self.decimation).astype(jnp.int32)
            idx = jnp.arange(inputs.shape[-1])
            mask = (idx[None, None, :] < frames[:, None, None]) \
                .astype(inputs.dtype)
            denom = jnp.maximum(frames, 1)[:, None, None]
            mean = (inputs * mask).sum(-1, keepdims=True) / denom
            power = (inputs**2 * mask).sum(-1, keepdims=True) / denom
            valid = (lengths > 0).astype(inputs.dtype)
            return (
                (mean * valid[:, None, None]).sum(0),
                (power * valid[:, None, None]).sum(0),
                valid.sum(),
            )

        mean_acc = np.zeros((self.input_size, 1))
        power_acc = np.zeros((self.input_size, 1))
        count = 0.0
        for batch, lengths in dataloader:
            if isinstance(batch, list):
                batch = batch[0]
                lengths = lengths[:, 0]
            m, p, c = batch_stats(jnp.asarray(batch), jnp.asarray(lengths))
            mean_acc += np.asarray(m)
            power_acc += np.asarray(p)
            count += float(c)
        mean = mean_acc / count
        std = np.sqrt(power_acc / count - mean**2)
        variables = dict(variables)
        variables['stats'] = {
            'mean': jnp.asarray(mean), 'std': jnp.asarray(std)
        }
        return variables
