"""SGMSE+ family: score-based diffusion speech enhancement.

Richter et al., IEEE/ACM TASLP 2023. Behavioral reference:
brever/models/sgmse/sgmse.py:12-338. Works in the compressed complex
STFT domain (|X|^0.5 * 0.15, Nyquist discarded); training is the
variance-exploding denoising loss with preconditioning weights;
inference runs a reverse-SDE solver (PC or EDM-Heun) as a jitted
lax.scan. Default NCSN++ geometry: 65,590,694 parameters (pinned).

Registered sub-models (argspec inherits through ``_is_submodel``):
``sgmsep``, ``sgmsepm``, ``sgmsepheun``, ``sgmsepmheun``, ``idmse``.
"""

import jax
import jax.numpy as jnp

from ...ops import STFT
from ..base import BreverBaseModel, ModelRegistry
from .net import DiffusionUNet
from .preconditioning import Preconditioning
from .sdes import SDERegistry, _randn_like
from .solvers import SolverRegistry


class _BoundDenoiser:
    """Preconditioning bound to a variables pytree (for solvers)."""

    def __init__(self, precond, variables):
        self.precond = precond
        self.variables = variables

    def score(self, x, y, sigma, t):
        return self.precond.score(self.variables, x, y, sigma, t)


@ModelRegistry.register('sgmsep')
class SGMSEp(BreverBaseModel):

    def __init__(
        self,
        stft_frame_length: int = 512,
        stft_hop_length: int = 128,
        stft_window: str = 'hann',
        stft_compression_factor: float = 0.5,
        stft_scale_factor: float = 0.15,
        stft_discard_nyquist: bool = True,
        sde_name: str = 'richter-ouve',
        sde_stiffness: float = 1.5,
        sde_ve_sigma_min: float = 0.05,
        sde_ve_sigma_max: float = 0.5,
        sde_vp_beta_min: float = 0.01,
        sde_vp_beta_max: float = 1.0,
        sde_cosine_lambda_min: float = -12.0,
        sde_cosine_lambda_max: float = float('inf'),
        sde_cosine_shift: float = 3.0,
        sde_cosine_beta_clamp: float = 10.0,
        sde_bb_scaling: float = 0.1,
        sde_bb_k: float = 10.0,
        solver_name: str = 'pc',
        solver_num_steps: int = 16,
        solver_edm_schurn: float = float('inf'),
        solver_edm_smin: float = 0.0,
        solver_edm_smax: float = float('inf'),
        solver_edm_snoise: float = 1.0,
        solver_pc_corrector_steps: int = 1,
        solver_pc_corrector_snr: float = 0.5,
        net_base_channels: int = 128,
        net_channel_mult: list[int] = [1, 1, 2, 2, 2, 2, 2],
        net_num_blocks_per_res: int = 2,
        net_noise_channel_mult: int = 2,
        net_emb_channel_mult: int = 4,
        net_fir_kernel: list[int] = [1, 3, 3, 1],
        net_attn_resolutions: list[int] = [16],
        net_attn_bottleneck: bool = True,
        net_encoder_type: str = 'skip',
        net_decoder_type: str = 'skip',
        net_block_type: str = 'ncsn',
        net_skip_scale: float = 0.5**0.5,
        net_dropout: float = 0.0,
        net_aux_out_channels: int = 4,
        preconditioning_cskip: str = 'richter',
        preconditioning_cout: str = 'richter',
        preconditioning_cin: str = 'richter',
        preconditioning_cnoise: str = 'richter',
        preconditioning_cshift: str = 'richter',
        preconditioning_weight: str = 'richter',
        preconditioning_sigma_data: float = 0.1,
        t_eps: float = 0.01,
        criterion: str = 'mse',
        optimizer: str = 'adam',
        learning_rate: float = 0.0001,
    ):
        super().__init__(criterion=criterion)
        self.stft = STFT(
            frame_length=stft_frame_length,
            hop_length=stft_hop_length,
            window=stft_window,
            compression_factor=stft_compression_factor,
            scale_factor=stft_scale_factor,
            normalized=False,
        )
        self.stft_discard_nyquist = stft_discard_nyquist

        self.sde = SDERegistry.get(sde_name)(
            stiffness=sde_stiffness,
            sigma_min=sde_ve_sigma_min,
            sigma_max=sde_ve_sigma_max,
            beta_min=sde_vp_beta_min,
            beta_max=sde_vp_beta_max,
            lambda_min=sde_cosine_lambda_min,
            lambda_max=sde_cosine_lambda_max,
            shift=sde_cosine_shift,
            beta_clamp=sde_cosine_beta_clamp,
            scaling=sde_bb_scaling,
            k=sde_bb_k,
        )
        self.solver = SolverRegistry.get(solver_name)(
            num_steps=solver_num_steps,
            schurn=solver_edm_schurn,
            smin=solver_edm_smin,
            smax=solver_edm_smax,
            snoise=solver_edm_snoise,
            corrector_steps=solver_pc_corrector_steps,
            corrector_snr=solver_pc_corrector_snr,
        )
        self.module = DiffusionUNet(
            num_freqs=stft_frame_length // 2,
            base_channels=net_base_channels,
            channel_mult=tuple(net_channel_mult),
            num_blocks_per_res=net_num_blocks_per_res,
            noise_channel_mult=net_noise_channel_mult,
            emb_channel_mult=net_emb_channel_mult,
            fir_kernel=tuple(net_fir_kernel),
            attn_resolutions=tuple(net_attn_resolutions),
            attn_bottleneck=net_attn_bottleneck,
            encoder_type=net_encoder_type,
            decoder_type=net_decoder_type,
            block_type=net_block_type,
            skip_scale=net_skip_scale,
            dropout=net_dropout,
            aux_out_channels=net_aux_out_channels,
        )
        self.model = Preconditioning(
            net=self.module,
            sde=self.sde,
            cskip=preconditioning_cskip,
            cout=preconditioning_cout,
            cin=preconditioning_cin,
            cnoise=preconditioning_cnoise,
            cshift=preconditioning_cshift,
            weight=preconditioning_weight,
            sigma_data=preconditioning_sigma_data,
        )
        self.t_eps = t_eps
        self.optimizer_name = optimizer
        self.learning_rate = learning_rate

    # ------------------------------------------------------------------

    def init_variables(self, rng):
        def init(rng):
            n_freqs = self.stft.frame_length // 2
            # frames multiple of 2**(num_res-1) not required: the
            # resampler padding stack restores odd sizes
            x = jnp.zeros((1, n_freqs, 64, 4), jnp.float32)
            cnoise = jnp.zeros((1,), jnp.float32)
            return self.module.init(rng, x, cnoise)
        return self._jit_init(init, rng)

    def optimizer(self):
        import optax
        return getattr(optax, self.optimizer_name)(self.learning_rate)

    def transform(self, sources):
        """(…, 2, channels, samples) -> compressed complex STFT pair."""
        unbatched = sources.ndim == 3
        if unbatched:
            sources = sources[None]
        mono = sources.mean(axis=-2)  # (B, 2, samples)
        norm = jnp.abs(mono[:, :1]).max(axis=-1, keepdims=True)
        mono = mono / jnp.maximum(norm, 1e-10)
        spec = self.stft(mono)
        if self.stft_discard_nyquist:
            spec = spec[..., :-1, :]
        return spec[0] if unbatched else spec

    def loss(self, variables, batch, lengths, rng, train=True):
        spec = self.transform(batch)        # (B, 2, F, T) complex
        y, x_0 = spec[:, :1], spec[:, 1:]
        t_rng, n_rng, drop_rng = jax.random.split(rng, 3)
        t = jax.random.uniform(
            t_rng, (x_0.shape[0], 1, 1, 1)) * (1 - self.t_eps) + self.t_eps
        sigma = self.sde.sigma(t)
        n = sigma * _randn_like(n_rng, x_0)
        weight = self.model.weight(sigma)
        d = self.model(variables, x_0 - y + n, y, sigma, t,
                       rng=drop_rng, deterministic=not train)
        frame_lengths = self.frame_count(
            lengths, self.stft.frame_length, self.stft.hop_length)
        # center padding adds n_fft//2 on both sides -> extra frames
        extra = self.stft.n_fft // self.stft.hop_length
        frame_lengths = jnp.where(
            lengths > 0, frame_lengths + extra, 0).astype(jnp.int32)
        return self.criterion(d, x_0 - y, frame_lengths,
                              weight=weight.reshape(-1))

    def _enhance(self, variables, x, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        length = x.shape[-1]
        mono = x.mean(axis=-2, keepdims=True)  # (B, 1, samples)
        norm = jnp.abs(mono).max(axis=-1, keepdims=True)
        mono = mono / jnp.maximum(norm, 1e-10)
        spec = self.stft(mono)
        if self.stft_discard_nyquist:
            spec = spec[..., :-1, :]
        bound = _BoundDenoiser(self.model, variables)
        out, _ = self.solver(self.sde, spec, bound, rng)
        if self.stft_discard_nyquist:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 1), (0, 0)))
        wav = self.stft.backward(out)
        wav = wav * norm
        return wav[..., :length][:, 0]


@ModelRegistry.register('sgmsepm')
class SGMSEpM(SGMSEp):
    """Lighter U-Net variant (Lemercier et al., ICASSP 2023)."""

    _is_submodel = True

    def __init__(
        self,
        net_channel_mult: list[int] = [1, 2, 2, 2],
        net_num_blocks_per_res: int = 1,
        net_attn_resolutions: list[int] = [],
        **kwargs,
    ):
        super().__init__(
            net_channel_mult=net_channel_mult,
            net_num_blocks_per_res=net_num_blocks_per_res,
            net_attn_resolutions=net_attn_resolutions,
            **kwargs,
        )


@ModelRegistry.register('sgmsepheun')
class SGMSEpHeun(SGMSEp):
    """SGMSE+ with cosine SDE, EDM preconditioning and Heun solver."""

    _is_submodel = True

    def __init__(
        self,
        sde_name: str = 'brever-oucosine',
        sde_stiffness: float = 0.0,
        solver_name: str = 'edm',
        preconditioning_cskip: str = 'edm',
        preconditioning_cout: str = 'edm',
        preconditioning_cin: str = 'edm',
        preconditioning_cnoise: str = 'edm',
        preconditioning_cshift: str = 'edm',
        preconditioning_weight: str = 'edm',
        **kwargs,
    ):
        super().__init__(
            sde_name=sde_name,
            sde_stiffness=sde_stiffness,
            solver_name=solver_name,
            preconditioning_cskip=preconditioning_cskip,
            preconditioning_cout=preconditioning_cout,
            preconditioning_cin=preconditioning_cin,
            preconditioning_cnoise=preconditioning_cnoise,
            preconditioning_cshift=preconditioning_cshift,
            preconditioning_weight=preconditioning_weight,
            **kwargs,
        )


@ModelRegistry.register('sgmsepmheun')
class SGMSEpMHeun(SGMSEpM):

    _is_submodel = True

    def __init__(
        self,
        sde_name: str = 'brever-oucosine',
        sde_stiffness: float = 0.0,
        solver_name: str = 'edm',
        preconditioning_cskip: str = 'edm',
        preconditioning_cout: str = 'edm',
        preconditioning_cin: str = 'edm',
        preconditioning_cnoise: str = 'edm',
        preconditioning_cshift: str = 'edm',
        preconditioning_weight: str = 'edm',
        **kwargs,
    ):
        super().__init__(
            sde_name=sde_name,
            sde_stiffness=sde_stiffness,
            solver_name=solver_name,
            preconditioning_cskip=preconditioning_cskip,
            preconditioning_cout=preconditioning_cout,
            preconditioning_cin=preconditioning_cin,
            preconditioning_cnoise=preconditioning_cnoise,
            preconditioning_cshift=preconditioning_cshift,
            preconditioning_weight=preconditioning_weight,
            **kwargs,
        )


@ModelRegistry.register('idmse')
class IDMSE(SGMSEp):
    """Interpolation diffusion with the ADM backbone."""

    _is_submodel = True

    def __init__(
        self,
        sde_name: str = 'brever-oucosine',
        sde_stiffness: float = 0.0,
        solver_name: str = 'edm',
        preconditioning_cskip: str = 'edm',
        preconditioning_cout: str = 'edm',
        preconditioning_cin: str = 'edm',
        preconditioning_cnoise: str = 'edm',
        preconditioning_cshift: str = 'edm',
        preconditioning_weight: str = 'edm',
        net_base_channels: int = 64,
        net_channel_mult: list[int] = [1, 2, 3, 4],
        net_num_blocks_per_res: int = 1,
        net_noise_channel_mult: int = 1,
        net_emb_channel_mult: int = 4,
        net_fir_kernel: list[int] = [1, 1],
        net_attn_resolutions: list[int] = [],
        net_encoder_type: str = 'standard',
        net_decoder_type: str = 'standard',
        net_block_type: str = 'adm',
        **kwargs,
    ):
        super().__init__(
            sde_name=sde_name,
            sde_stiffness=sde_stiffness,
            solver_name=solver_name,
            preconditioning_cskip=preconditioning_cskip,
            preconditioning_cout=preconditioning_cout,
            preconditioning_cin=preconditioning_cin,
            preconditioning_cnoise=preconditioning_cnoise,
            preconditioning_cshift=preconditioning_cshift,
            preconditioning_weight=preconditioning_weight,
            net_base_channels=net_base_channels,
            net_channel_mult=net_channel_mult,
            net_num_blocks_per_res=net_num_blocks_per_res,
            net_noise_channel_mult=net_noise_channel_mult,
            net_emb_channel_mult=net_emb_channel_mult,
            net_fir_kernel=net_fir_kernel,
            net_attn_resolutions=net_attn_resolutions,
            net_encoder_type=net_encoder_type,
            net_decoder_type=net_decoder_type,
            net_block_type=net_block_type,
            **kwargs,
        )


@ModelRegistry.register('idmselarge')
class IDMSELarge(IDMSE):
    """IDMSE with the NCSN++-sized backbone (the reference ships this
    as a config-only variant, config/models/idmselarge.yaml, with a
    stale schema and no registry entry; registered properly here)."""

    _is_submodel = True

    def __init__(
        self,
        net_base_channels: int = 128,
        net_channel_mult: list[int] = [1, 1, 2, 2, 2, 2, 2],
        net_num_blocks_per_res: int = 2,
        net_noise_channel_mult: int = 2,
        net_fir_kernel: list[int] = [1, 3, 3, 1],
        net_attn_resolutions: list[int] = [16],
        **kwargs,
    ):
        super().__init__(
            net_base_channels=net_base_channels,
            net_channel_mult=net_channel_mult,
            net_num_blocks_per_res=net_num_blocks_per_res,
            net_noise_channel_mult=net_noise_channel_mult,
            net_fir_kernel=net_fir_kernel,
            net_attn_resolutions=net_attn_resolutions,
            **kwargs,
        )
