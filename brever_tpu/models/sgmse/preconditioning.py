"""Denoiser preconditioning (Karras-style cskip/cout/cin/cnoise).

Wraps the raw U-Net apply function with the input/output scalings that
turn it into a denoiser D(x, y, sigma, t), plus the score function the
solvers consume. Registry of parametrizations mirrors the reference
(brever/models/sgmse/preconditioning.py:12-58): ``richter`` and ``edm``
(plus the ``edm-scaled-shift`` cshift variant).
"""

import jax
import jax.numpy as jnp

from ..base import param_dtype


def _make_rules(sigma_data):
    return {
        'richter': dict(
            cskip=lambda sigma: 1.0,
            cout=lambda sigma, scaling, t: -scaling * sigma**2 / t,
            cin=lambda sigma, scaling: scaling,
            cshift=lambda y, cin, scaling: y,
            cnoise=lambda sigma, t: jnp.log(t),
            weight=lambda sigma: 1 / sigma**2,
        ),
        'edm': dict(
            cskip=lambda sigma: sigma_data**2 / (sigma**2 + sigma_data**2),
            cout=lambda sigma, scaling, t:
                sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2),
            cin=lambda sigma, scaling:
                1 / jnp.sqrt(sigma**2 + sigma_data**2),
            cshift=lambda y, cin, scaling: 0.0,
            cnoise=lambda sigma, t: jnp.log(sigma) / 4,
            weight=lambda sigma:
                (sigma**2 + sigma_data**2) / (sigma * sigma_data)**2,
        ),
        'edm-scaled-shift': dict(
            cshift=lambda y, cin, scaling: cin * y / scaling,
        ),
    }


class Preconditioning:
    """Functional denoiser wrapper: ``__call__(variables, x, y, sigma, t)``.

    ``x``/``y`` are complex spectrograms ``(batch, 1, freq, frames)``;
    the raw net consumes channels-last real/imag stacks.
    """

    def __init__(self, net, sde, cskip, cout, cin, cshift, cnoise, weight,
                 sigma_data):
        self.net = net
        self.sde = sde
        rules = _make_rules(sigma_data)
        for arg, choice in [('cskip', cskip), ('cout', cout), ('cin', cin),
                            ('cshift', cshift), ('cnoise', cnoise),
                            ('weight', weight)]:
            if choice not in rules or arg not in rules[choice]:
                raise ValueError(
                    f'Invalid preconditioning {arg}: {choice}')
            setattr(self, arg, rules[choice][arg])

    def __call__(self, variables, x, y, sigma, t, rng=None,
                 deterministic=True):
        scaling = self.sde.s(t)
        cskip = self.cskip(sigma)
        cout = self.cout(sigma, scaling, t)
        cin = self.cin(sigma, scaling)
        cshift = self.cshift(y, cin, scaling)
        cnoise = self.cnoise(sigma, t)

        x_in = cin * x + cshift
        # (B, 1, F, T) complex -> (B, F, T, 4) channels-last real/imag.
        # The U-Net trunk runs in the (possibly bf16) amp dtype — the
        # complex spectrogram algebra around it is f32/c64 (see
        # base.param_dtype); skip/out scalings stay f32.
        net_dtype = param_dtype(variables)
        net_in = jnp.stack(
            [x_in[:, 0].real, x_in[:, 0].imag, y[:, 0].real, y[:, 0].imag],
            axis=-1,
        ).astype(net_dtype)
        rngs = {'dropout': rng} if rng is not None else {}
        net_out = self.net.apply(
            variables, net_in, cnoise.astype(net_dtype),
            deterministic=deterministic, rngs=rngs).astype(jnp.float32)
        denoised = jax.lax.complex(
            net_out[..., 0], net_out[..., 1])[:, None]
        return cskip * x + cout * denoised

    def score(self, variables, x, y, sigma, t, **kwargs):
        d = self(variables, x, y, sigma, t, **kwargs)
        return (d - x) / (self.sde.s(t) * sigma**2)
