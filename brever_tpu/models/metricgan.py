"""MetricGAN-OKD / MetricGAN+ — metric-driven GAN mask estimation.

Shin et al., ICML 2023 / Fu et al., INTERSPEECH 2021. Behavioral
reference: brever/models/metricganokd/metricganokd.py:32-538 (which
itself documents deviations from upstream and is flagged experimental).
Default geometry: 2,172,329 trainable parameters (pinned).

Design: N generators (BLSTM mask nets, one per target metric) + one CNN
discriminator regressing metric scores; per-batch alternating updates;
online knowledge distillation between generators; discriminator trained
on noisy / enhanced / SNR-augmented samples.

TPU notes: the metric-in-the-loop scores (the discriminator's
regression targets) are host computations, run between jitted phases.
``precompute_metric`` moves the noisy-vs-clean score into the
dataloader (``loader_transform``, threaded/overlapped with training)
so each epoch only scores *enhanced* and augmented candidates —
reference behavior (metricganokd.py:175-183). ``precompute_stft`` is
accepted for API parity but is a deliberate no-op: the reference
precomputes STFTs because a torch CPU STFT in the worker is cheaper
than in the loop; here the STFT is traced into the jitted step where
XLA fuses it with the model (precomputing would *add* host->device
traffic).

The default target metric is ``pesq`` like the reference, scored by
the in-repo ITU-T P.862 implementation (:mod:`brever_tpu.pesq`);
``stoi``/``estoi`` are also available as targets.
"""


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import STFT
from .base import BreverBaseModel, ModelRegistry
from .common import batch_norm
from .rnn import BLSTM


class _Generator(nn.Module):
    lstm_in_size: int
    lstm_hidden_size: int
    lstm_num_layers: int
    lstm_dropout: float
    lstm_bidirectional: bool
    fc_channels: tuple
    min_mask: float = 0.05
    sigmoid_beta: float = 1.2

    @nn.compact
    def __call__(self, noisy_mag, train=False):
        # noisy_mag: (B, F, T) -> tokens over time
        x = jnp.swapaxes(noisy_mag, -1, -2)  # (B, T, F)
        for i in range(self.lstm_num_layers):
            if self.lstm_bidirectional:
                x = BLSTM(self.lstm_hidden_size, name=f'blstm_{i}')(x)
            else:
                from .rnn import LSTM
                x = LSTM(self.lstm_hidden_size, name=f'lstm_{i}')(x)
            if i != self.lstm_num_layers - 1:
                x = nn.Dropout(self.lstm_dropout,
                               deterministic=not train)(x)
        for i, ch in enumerate(self.fc_channels):
            x = nn.Dense(ch, name=f'fc_{i}')(x)
            x = nn.leaky_relu(x, 0.3)
        x = nn.Dense(self.lstm_in_size, name='fc_out')(x)
        alpha = self.param('sigmoid_alpha', nn.initializers.ones,
                           (self.lstm_in_size,))
        mask = self.sigmoid_beta * jax.nn.sigmoid(alpha * x)
        mask = jnp.swapaxes(mask, -1, -2)  # (B, F, T)
        return noisy_mag * jnp.clip(mask, min=self.min_mask)


class _Discriminator(nn.Module):
    out_size: int
    conv_channels: tuple
    fc_channels: tuple
    batchnorm: bool
    batchnorm_momentum: float
    sigmoid_output: bool

    @nn.compact
    def __call__(self, input_mag, clean_mag, train=False):
        # (B, F, T) pair -> (B, T, F, 2) channels-last image
        x = jnp.stack([input_mag, clean_mag], axis=-1)
        x = jnp.swapaxes(x, 1, 2)
        if self.batchnorm:
            x = batch_norm(x, train, 'norm', epsilon=1e-5,
                           momentum=1 - self.batchnorm_momentum)
        for i, ch in enumerate(self.conv_channels):
            conv = nn.Conv(ch, (5, 5), padding='VALID', name=f'conv_{i}')
            x = nn.SpectralNorm(conv)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.3)
        x = x.mean(axis=(1, 2))  # global average pooling
        for i, ch in enumerate(self.fc_channels):
            dense = nn.Dense(ch, name=f'fc_{i}')
            x = nn.SpectralNorm(dense)(x, update_stats=train)
            x = nn.leaky_relu(x, 0.3)
        dense = nn.Dense(self.out_size, name='fc_out')
        x = nn.SpectralNorm(dense)(x, update_stats=train)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


def _device_metrics(metric_names, fs):
    """Device scorer twin of :func:`_host_metrics`: (deg, ref, lengths)
    -> (B, n_metrics) in [0, 1], traceable inside the GAN step."""

    def score(deg, ref, lengths):
        from ..metrics_device import DEVICE_METRICS
        lengths = jnp.maximum(jnp.asarray(lengths), 1)
        cols = []
        for name in metric_names:
            fn = DEVICE_METRICS[name]
            if name in ('pesq', 'pesq_approx'):
                v = fn(deg, ref, lengths=lengths, fs=fs)
                # same normalization as the host path (published wb
                # hard bounds, reference brever/metrics.py:71-93)
                lo, hi = 1.0, 4.643888749336258
                v = (v - lo) / (hi - lo)
            elif name in ('snr', 'sisnr'):
                v = fn(deg, ref, lengths=lengths)
            else:
                v = fn(deg, ref, lengths=lengths, fs=fs)
            cols.append(v)
        out = jnp.stack(cols, axis=1)
        out = jnp.clip(jnp.nan_to_num(out), 0.0, 1.0) \
            .astype(jnp.float32)
        # regression TARGETS: detached, like the host-computed scores
        # (gradients must not flow into the generators through the
        # metric graph — and the PESQ backward is enormous)
        return jax.lax.stop_gradient(out)

    return score


def _host_metrics(metric_names, fs):
    """Host scorer: (deg, ref, lengths) -> (B, n_metrics) in [0, 1]."""
    from ..metrics import MetricRegistry

    def score(deg, ref, lengths):
        deg = np.asarray(deg, dtype=np.float64)
        ref = np.asarray(ref, dtype=np.float64)
        lengths = np.maximum(np.asarray(lengths), 1)
        cols = []
        for name in metric_names:
            metric = MetricRegistry.get(name)
            kwargs = {'normalized': True} if name == 'pesq' else {}
            try:
                values = metric(deg, ref, fs, lengths=lengths, **kwargs)
            except (RuntimeError, ValueError):
                values = np.zeros(deg.shape[0])
            cols.append(np.asarray(values, dtype=np.float32))
        out = np.stack(cols, axis=1)
        return np.clip(np.nan_to_num(out), 0.0, 1.0).astype(np.float32)

    return score


@ModelRegistry.register('metricganokd')
class MetricGANOKD(BreverBaseModel):

    def __init__(
        self,
        stft_frame_length: int = 512,
        stft_hop_length: int = 256,
        stft_n_fft: int = 512,
        stft_normalized: bool = False,
        stft_window: str = 'hamming',
        generator_lstm_hidden_size: int = 200,
        generator_lstm_num_layers: int = 2,
        generator_lstm_dropout: float = 0.1,
        generator_lstm_bidirectional: bool = True,
        generator_fc_channels: list[int] = [300],
        generator_optimizer: str = 'adam',
        generator_learning_rate: float = 1e-4,
        discriminator_conv_channels: list[int] = [16, 32, 64, 128],
        discriminator_fc_channels: list[int] = [50, 10],
        discriminator_batchnorm: bool = True,
        discriminator_batchnorm_momentum: float = 0.01,
        discriminator_sigmoid_output: bool = False,
        discriminator_optimizer: str = 'adam',
        discriminator_learning_rate: float = 1e-4,
        discriminator_train_clean: bool = False,
        augment: bool = True,
        augment_snr_min: float = 15.0,
        augment_snr_max: float = 55.0,
        target_metrics: list[str] = ['pesq'],
        inference_metric: str = 'pesq',
        xavier_init: bool = True,
        precompute_stft: bool = True,
        precompute_metric: bool = True,
        mag_eps: float = 1e-14,
        min_mask: float = 0.05,
        adversarial_loss: str = 'MSELoss',
        kd_loss: str = 'MSELoss',
        kd_weight: float = 10.0,
        grad_clip: float = 5.0,
        fs: int = 16000,
        device_metric_scoring: bool = False,
    ):
        super().__init__()
        if inference_metric not in target_metrics:
            raise ValueError(
                'inference_metric must be one of target_metrics, got '
                f"'{inference_metric}' and {target_metrics}")
        self.stft = STFT(
            frame_length=stft_frame_length,
            hop_length=stft_hop_length,
            n_fft=stft_n_fft,
            window=stft_window,
            normalized=stft_normalized,
        )
        self.target_metrics = list(target_metrics)
        self.inference_metric_idx = target_metrics.index(inference_metric)
        self.n_generators = len(target_metrics)
        self.generators = [
            _Generator(
                lstm_in_size=stft_n_fft // 2 + 1,
                lstm_hidden_size=generator_lstm_hidden_size,
                lstm_num_layers=generator_lstm_num_layers,
                lstm_dropout=generator_lstm_dropout,
                lstm_bidirectional=generator_lstm_bidirectional,
                fc_channels=tuple(generator_fc_channels),
                min_mask=min_mask,
            )
            for _ in target_metrics
        ]
        self.discriminator = _Discriminator(
            out_size=self.n_generators,
            conv_channels=tuple(discriminator_conv_channels),
            fc_channels=tuple(discriminator_fc_channels),
            batchnorm=discriminator_batchnorm,
            batchnorm_momentum=discriminator_batchnorm_momentum,
            sigmoid_output=discriminator_sigmoid_output,
        )
        self.generator_optimizer = generator_optimizer
        self.generator_learning_rate = generator_learning_rate
        self.discriminator_optimizer = discriminator_optimizer
        self.discriminator_learning_rate = discriminator_learning_rate
        self.discriminator_train_clean = discriminator_train_clean
        self.augment = augment
        self.augment_snr = (augment_snr_min, augment_snr_max)
        self.kd_weight = kd_weight
        self.mag_eps = mag_eps
        self.grad_clip = grad_clip
        self.fs = fs
        self._score = _host_metrics(self.target_metrics, fs)
        #: score the metric-in-the-loop on device (jax metric twins,
        #: brever_tpu.metrics_device): the whole GAN step — candidate
        #: synthesis, PESQ/STOI regression targets, both optimizer
        #: updates — becomes ONE jitted graph with no host round trip.
        #: The reference architecture cannot do this (host C-extension
        #: metrics between torch phases). Off by default: the device
        #: twins are f32 and PESQ aligns with the global delay only
        #: (exact for the time-aligned candidates scored here, but
        #: golden pins were recorded against host scoring).
        self.device_metric_scoring = device_metric_scoring
        self.precompute_metric = precompute_metric
        # precompute_stft accepted for API parity; see module docstring
        del precompute_stft
        del adversarial_loss, kd_loss  # MSE only (reference default)

    # ------------------------------------------------------------------

    def init_variables(self, rng):
        def init(rng):
            rngs = jax.random.split(rng, self.n_generators + 1)
            n_freqs = self.stft.n_fft // 2 + 1
            mag = jnp.zeros((1, n_freqs, 16), jnp.float32)
            params, aux = {}, {}
            for i, (gen, gen_rng) in enumerate(
                    zip(self.generators, rngs[:-1])):
                variables = gen.init(gen_rng, mag)
                params[f'generator_{i}'] = variables['params']
            d_vars = self.discriminator.init(rngs[-1], mag, mag)
            params['discriminator'] = d_vars['params']
            aux['batch_stats'] = {
                'discriminator': dict(d_vars.get('batch_stats', {}))}
            return {'params': params, 'batch_stats': aux['batch_stats']}
        return self._jit_init(init, rng)

    def optimizer(self):
        gen_tx = getattr(optax, self.generator_optimizer)(
            self.generator_learning_rate)
        disc_tx = getattr(optax, self.discriminator_optimizer)(
            self.discriminator_learning_rate)
        if self.grad_clip:
            gen_tx = optax.chain(
                optax.clip_by_global_norm(self.grad_clip), gen_tx)
            disc_tx = optax.chain(
                optax.clip_by_global_norm(self.grad_clip), disc_tx)
        return {'generators': gen_tx, 'discriminator': disc_tx}

    def init_opt_state(self, tx, params):
        gen_states = tuple(
            tx['generators'].init(params[f'generator_{i}'])
            for i in range(self.n_generators)
        )
        return {
            'generators': gen_states,
            'discriminator': tx['discriminator'].init(
                params['discriminator']),
        }

    def transform(self, sources):
        return sources.mean(axis=-2)  # binaural -> monaural

    @property
    def loader_transform(self):
        """Per-item precompute for the dataloader workers: mono mixdown
        + the noisy-vs-clean metric score (reference
        metricganokd.py:175-183).  Host/numpy only — runs threaded in
        the loader, overlapped with device compute, so the training
        loop never re-scores the unchanged noisy signal."""
        if not self.precompute_metric:
            return None

        def fn(sources):
            mono = np.asarray(sources, dtype=np.float32).mean(axis=-2)
            score = self._score(
                mono[0:1], mono[1:2],
                np.array([mono.shape[-1]]))[0]
            return mono, score

        return fn

    # ------------------------------------------------------------------

    def _stft_mag_phase(self, x):
        spec = self.stft(x)
        mag = jnp.log1p(jnp.abs(spec) + self.mag_eps)
        return mag, jnp.angle(spec)

    def _istft(self, mag, phase, orig_length):
        mag = jnp.expm1(mag)
        spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
        return self.stft.backward(spec)[..., :orig_length]

    def _apply_generator(self, params, i, mag, rng=None, train=False):
        rngs = {'dropout': rng} if rng is not None else {}
        return self.generators[i].apply(
            {'params': params[f'generator_{i}']}, mag, train=train,
            rngs=rngs)

    def _apply_discriminator(self, params, disc_stats, mag, clean_mag,
                             train=False):
        variables = {'params': params['discriminator']}
        if disc_stats:
            variables['batch_stats'] = disc_stats
        if train:
            out, updates = self.discriminator.apply(
                variables, mag, clean_mag, train=True,
                mutable=['batch_stats'])
            return out, updates['batch_stats']
        return self.discriminator.apply(
            variables, mag, clean_mag, train=False), disc_stats

    # ------------------------------------------------------------------
    # custom GAN steps
    #
    # Metric scores (discriminator regression targets) are host
    # computations; pure_callback deadlocks inside sharded XLA-CPU
    # collectives, so the step is split into jitted phases with host
    # scoring in between (host_side_steps=True).

    host_side_steps = True

    def make_step_fns(self, tx):
        make_candidates, device_train_step, device_val_step = \
            self.device_step_fns(tx)

        if self.device_metric_scoring:
            # fully device-resident GAN step: candidates + metric
            # regression targets + both updates in one jitted graph
            dev_score = _device_metrics(self.target_metrics, self.fs)

            def device_scores(state, batch, lengths):
                noisy_wav, clean_wav, enh_wavs, aug_wav = \
                    make_candidates(state, batch, lengths)
                l1 = lengths[:, 0] if lengths.ndim > 1 else lengths
                if isinstance(batch, (tuple, list)):
                    noisy_score = jnp.asarray(batch[1], jnp.float32)
                else:
                    noisy_score = dev_score(noisy_wav, clean_wav, l1)
                scores = {
                    'noisy': noisy_score,
                    'enh': jnp.stack([
                        dev_score(enh_wavs[k], clean_wav, l1)
                        for k in range(self.n_generators)
                    ]),
                }
                if self.augment:
                    scores['aug'] = dev_score(aug_wav, clean_wav, l1)
                return scores, aug_wav

            def full_train(state, batch, lengths, _):
                scores, aug_wav = device_scores(state, batch, lengths)
                return device_train_step(
                    state, batch, lengths, scores, aug_wav)

            def full_val(state, batch, lengths, _):
                scores, aug_wav = device_scores(state, batch, lengths)
                return device_val_step(
                    state, batch, lengths, scores, aug_wav)

            return jax.jit(full_train), jax.jit(full_val)

        jit_candidates = jax.jit(make_candidates)
        jit_train = jax.jit(device_train_step)
        jit_val = jax.jit(device_val_step)

        def host_scores(state, batch, lengths):
            noisy_wav, clean_wav, enh_wavs, aug_wav = jit_candidates(
                state, batch, lengths)
            clean_np = np.asarray(clean_wav)
            lengths_np = np.asarray(lengths)
            if lengths_np.ndim > 1:
                lengths_np = lengths_np[:, 0]
            if isinstance(batch, (tuple, list)):
                # loader_transform already scored noisy-vs-clean per
                # item; only enhanced/augmented candidates (which
                # change every step) are scored here
                noisy_score = jnp.asarray(batch[1], jnp.float32)
            else:
                noisy_score = jnp.asarray(
                    self._score(np.asarray(noisy_wav), clean_np,
                                lengths_np))
            scores = {
                'noisy': noisy_score,
                'enh': jnp.asarray(np.stack([
                    self._score(np.asarray(enh_wavs[k]), clean_np,
                                lengths_np)
                    for k in range(self.n_generators)
                ])),
            }
            if self.augment:
                scores['aug'] = jnp.asarray(
                    self._score(np.asarray(aug_wav), clean_np,
                                lengths_np))
            return scores, aug_wav

        def train_step(state, batch, lengths, _):
            scores, aug_wav = host_scores(state, batch, lengths)
            return jit_train(state, batch, lengths, scores, aug_wav)

        def val_step(state, batch, lengths, _):
            scores, aug_wav = host_scores(state, batch, lengths)
            return jit_val(state, batch, lengths, scores, aug_wav)

        return train_step, val_step

    def device_step_fns(self, tx):
        """The three pure jittable phases of the GAN step: candidate
        synthesis (everything the host scorer consumes), the
        generator+discriminator train update, and the val loss. Exposed
        separately so the benchmark can time the device work with
        synthetic scores (host metric scoring is loader-overlapped /
        multiprocess in production and device-independent)."""
        def split_batch(batch):
            # batch is either raw (B, 2, ch, T), or, when the loader
            # ran loader_transform, [mono (B, 2, T), noisy_score]
            wavs = batch[0] if isinstance(batch, (tuple, list)) else batch
            mono = self.transform(wavs) if wavs.ndim == 4 else wavs
            return mono[:, 0], mono[:, 1]  # noisy, clean

        def generator_losses(params, batch_stats, noisy_mag, clean_mag,
                             rng, train):
            enh_mags = [
                self._apply_generator(params, i, noisy_mag, rng, train)
                for i in range(self.n_generators)
            ]
            losses = []
            for i, enh_mag in enumerate(enh_mags):
                scores, _ = self._apply_discriminator(
                    params, batch_stats, enh_mag, clean_mag, train=False)
                adv = ((scores[:, i] - 1.0)**2).mean()
                kd = sum(
                    ((enh_mag - other)**2).mean()
                    for j, other in enumerate(enh_mags) if j != i
                )
                losses.append(adv + self.kd_weight * kd)
            return losses, enh_mags

        def make_candidates(state, batch, lengths):
            """Jitted phase A: everything the host scorer needs."""
            rng, aug_rng, n_rng = jax.random.split(state['rng'], 3)
            noisy_wav, clean_wav = split_batch(batch)
            noisy_mag, noisy_phase = self._stft_mag_phase(noisy_wav)
            params = state['params']
            enh_wavs = []
            for i in range(self.n_generators):
                enh_mag = self._apply_generator(params, i, noisy_mag)
                enh_wavs.append(self._istft(
                    enh_mag, noisy_phase, noisy_wav.shape[-1]))
            aug_wav = clean_wav
            if self.augment:
                lo, hi = self.augment_snr
                snr = jax.random.uniform(
                    aug_rng, (clean_wav.shape[0], 1)) * (hi - lo) + lo
                noise_std = clean_wav.std(axis=1, keepdims=True) \
                    * 10**(-snr / 20)
                aug_wav = clean_wav + noise_std * jax.random.normal(
                    n_rng, clean_wav.shape)
            return noisy_wav, clean_wav, jnp.stack(enh_wavs), aug_wav

        def discriminator_loss(params, batch_stats, noisy_mag, clean_mag,
                               enh_mags, aug_wav, scores, train):
            """scores: host-computed regression targets (device arrays)."""
            total = 0.0
            stats = batch_stats
            for k, enh_mag in enumerate(enh_mags):
                enh_mag = jax.lax.stop_gradient(enh_mag)
                pred_noisy, stats = self._apply_discriminator(
                    params, stats, noisy_mag, clean_mag, train=train)
                total = total + (
                    (pred_noisy - scores['noisy'])**2).mean()
                pred_enh, stats = self._apply_discriminator(
                    params, stats, enh_mag, clean_mag, train=train)
                total = total + ((pred_enh - scores['enh'][k])**2).mean()
                if self.augment:
                    aug_mag, _ = self._stft_mag_phase(aug_wav)
                    pred_aug, stats = self._apply_discriminator(
                        params, stats, aug_mag, clean_mag, train=train)
                    total = total + (
                        (pred_aug - scores['aug'])**2).mean()
            return total, stats

        def device_train_step(state, batch, lengths, scores, aug_wav):
            rng, g_rng, d_rng = jax.random.split(state['rng'], 3)
            noisy_wav, clean_wav = split_batch(batch)
            noisy_mag, noisy_phase = self._stft_mag_phase(noisy_wav)
            clean_mag, _ = self._stft_mag_phase(clean_wav)
            params = state['params']
            batch_stats = state['aux']['batch_stats']['discriminator']

            # generator updates (each on its own optimizer)
            new_params = dict(params)
            gen_losses = []
            gen_opt_states = []
            for i in range(self.n_generators):
                def gen_loss_fn(gen_params, i=i):
                    probe = dict(params)
                    probe[f'generator_{i}'] = gen_params
                    losses, _ = generator_losses(
                        probe, batch_stats, noisy_mag, clean_mag, g_rng,
                        True)
                    return losses[i]

                loss_i, grads = jax.value_and_grad(gen_loss_fn)(
                    params[f'generator_{i}'])
                updates, opt_state = tx['generators'].update(
                    grads, state['opt_state']['generators'][i],
                    params[f'generator_{i}'])
                new_params[f'generator_{i}'] = optax.apply_updates(
                    params[f'generator_{i}'], updates)
                gen_losses.append(loss_i)
                gen_opt_states.append(opt_state)

            # fresh enhanced mags from the *updated* generators
            _, enh_mags = generator_losses(
                new_params, batch_stats, noisy_mag, clean_mag, g_rng,
                False)

            def disc_loss_fn(disc_params):
                probe = dict(new_params)
                probe['discriminator'] = disc_params
                return discriminator_loss(
                    probe, batch_stats, noisy_mag, clean_mag, enh_mags,
                    aug_wav, scores, True)

            (loss_d, new_stats), grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True)(params['discriminator'])
            updates, disc_opt_state = tx['discriminator'].update(
                grads, state['opt_state']['discriminator'],
                params['discriminator'])
            new_params['discriminator'] = optax.apply_updates(
                params['discriminator'], updates)

            new_state = {
                **state,
                'params': new_params,
                'aux': {'batch_stats': {'discriminator': new_stats}},
                'opt_state': {
                    'generators': tuple(gen_opt_states),
                    'discriminator': disc_opt_state,
                },
                'step': state['step'] + 1,
                'rng': rng,
            }
            loss = {
                'loss_g': jnp.stack(gen_losses).mean(),
                'loss_d': loss_d,
            }
            return new_state, loss

        def device_val_step(state, batch, lengths, scores, aug_wav):
            noisy_wav, clean_wav = split_batch(batch)
            noisy_mag, noisy_phase = self._stft_mag_phase(noisy_wav)
            clean_mag, _ = self._stft_mag_phase(clean_wav)
            params = state['params']
            batch_stats = state['aux']['batch_stats']['discriminator']
            losses, enh_mags = generator_losses(
                params, batch_stats, noisy_mag, clean_mag, None, False)
            loss_d, _ = discriminator_loss(
                params, batch_stats, noisy_mag, clean_mag, enh_mags,
                aug_wav, scores, False)
            return state, {
                'loss_g': jnp.stack(losses).mean(),
                'loss_d': loss_d,
            }

        return make_candidates, device_train_step, device_val_step

    def loss(self, variables, batch, lengths, rng, train=True):
        raise NotImplementedError(
            'MetricGAN uses custom train/val steps (make_step_fns)')

    def _enhance(self, variables, x):
        mono = x.mean(axis=-2)
        mag, phase = self._stft_mag_phase(mono)
        enh_mag = self._apply_generator(
            variables['params'], self.inference_metric_idx, mag)
        return self._istft(enh_mag, phase, mono.shape[-1])


@ModelRegistry.register('metricganp')
class MetricGANp(MetricGANOKD):
    """MetricGAN+ (single metric, no KD by construction)."""

    _is_submodel = True

    def __init__(
        self,
        generator_lstm_dropout: float = 0.0,
        discriminator_conv_channels: list[int] = [15, 15, 15, 15],
        **kwargs,
    ):
        super().__init__(
            generator_lstm_dropout=generator_lstm_dropout,
            discriminator_conv_channels=discriminator_conv_channels,
            **kwargs,
        )
