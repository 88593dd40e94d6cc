"""Exponential moving averages over parameter pytrees.

Two flavors, matching the reference surface
(reference brever/modules/ema.py:65-275):

* ``EMA`` — traditional constant-beta EMA.
* ``EMAKarras`` — post-hoc EMA (Karras et al. 2023, arXiv:2312.02696):
  per-``sigma_rel`` power-function averages maintained during training,
  plus the least-squares profile combination that reconstructs an
  arbitrary EMA profile from a *series* of checkpoints.

All update math is pure pytree arithmetic — jittable and shardable, so
EMA updates fuse into the train step.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import load_checkpoint


def ema_update(ema_params, params, beta):
    """One EMA step: ``ema += (1 - beta) * (params - ema)``."""
    return jax.tree.map(
        lambda e, p: e + (1 - beta) * (p - e), ema_params, params
    )


class EMA:
    """Traditional EMA. State is just the averaged pytree."""

    def __init__(self, beta=0.999):
        assert 0.0 < beta < 1.0
        self.beta = beta

    def init(self, params):
        return jax.tree.map(jnp.array, params)

    def update(self, ema_params, params, num_updates=None):
        del num_updates
        return ema_update(ema_params, params, self.beta)


class EMAKarras:
    """Post-hoc EMA: several power-function averages tracked jointly.

    State layout (msgpack-friendly: string keys, arrays/ints as leaves)::

        {'num_updates': int,
         'ema_params': {str(sigma_rel): params_pytree, ...}}
    """

    def __init__(self, sigma_rels=(0.05, 0.1)):
        sigma_rels = list(sigma_rels)
        assert all(0.0 < s < 1.0 for s in sigma_rels)
        self.sigma_rels = sigma_rels
        self.gammas = {s: self.sigma_rel_to_gamma(s) for s in sigma_rels}

    def init(self, params):
        return {
            'num_updates': jnp.zeros((), jnp.int32),
            'ema_params': {
                str(s): jax.tree.map(jnp.array, params)
                for s in self.sigma_rels
            },
        }

    def update(self, state, params):
        t = state['num_updates'] + 1
        new = {'num_updates': t, 'ema_params': {}}
        for s in self.sigma_rels:
            gamma = self.gammas[s]
            beta = (1.0 - 1.0 / t.astype(jnp.float32))**(gamma + 1.0)
            new['ema_params'][str(s)] = ema_update(
                state['ema_params'][str(s)], params, beta
            )
        return new

    @staticmethod
    def sigma_rel_to_gamma(sigma_rel):
        """Invert sigma_rel(gamma) (Karras 2023, algorithm 2)."""
        t = sigma_rel**-2
        return np.roots([1, 7, 16 - t, 12 - t]).real.max()

    @staticmethod
    def solve_weights(t_i, gamma_i, t_r, gamma_r):
        """Least-squares profile combination (Karras 2023, algorithm 3)."""

        def p_dot_p(t_a, gamma_a, t_b, gamma_b):
            t_ratio = t_a / t_b
            t_exp = np.where(t_a < t_b, gamma_b, -gamma_a)
            t_max = np.maximum(t_a, t_b)
            num = (gamma_a + 1) * (gamma_b + 1) * t_ratio**t_exp
            den = (gamma_a + gamma_b + 1) * t_max
            return num / den

        def rv(x):
            return np.float64(x).reshape(-1, 1)

        def cv(x):
            return np.float64(x).reshape(1, -1)

        a_mat = p_dot_p(rv(t_i), rv(gamma_i), cv(t_i), cv(gamma_i))
        b_mat = p_dot_p(rv(t_i), rv(gamma_i), cv(t_r), cv(gamma_r))
        return np.linalg.solve(a_mat, b_mat)

    def post_hoc_ema(self, ckpts_or_ckpt_dir, sigma_rel_r, t_r=None,
                     extension='.ckpt', state_key='ema'):
        """Reconstruct EMA profiles from a series of checkpoints.

        Parameters
        ----------
        ckpts_or_ckpt_dir : str or list of str
            Checkpoint directory or explicit checkpoint paths. Each
            checkpoint must contain an ``EMAKarras`` state (optionally
            nested under ``state_key``).
        sigma_rel_r : float or list of float
            Target ``sigma_rel`` per reconstructed profile.
        t_r : int or list of int, optional
            Target update step per profile; defaults to the latest step.

        Returns
        -------
        pytree or list of pytree
            Averaged parameters per profile (a single pytree if
            ``sigma_rel_r`` was a scalar).
        """
        if isinstance(ckpts_or_ckpt_dir, str):
            ckpts = sorted(
                os.path.join(ckpts_or_ckpt_dir, f)
                for f in os.listdir(ckpts_or_ckpt_dir)
                if f.endswith(extension)
            )
            if not ckpts:
                raise ValueError(
                    f'no {extension} file in {ckpts_or_ckpt_dir}')
        else:
            ckpts = list(ckpts_or_ckpt_dir)

        scalar_input = not isinstance(sigma_rel_r, list)
        if scalar_input:
            sigma_rel_r = [sigma_rel_r] * (
                len(t_r) if isinstance(t_r, list) else 1
            )
        if not all(isinstance(s, float) and 0.0 < s < 1.0
                   for s in sigma_rel_r):
            raise ValueError(
                'sigma_rel_r values must be floats strictly in (0, 1)')
        if t_r is not None and not isinstance(t_r, list):
            t_r = [t_r] * len(sigma_rel_r)
        if t_r is not None and len(t_r) != len(sigma_rel_r):
            raise ValueError('sigma_rel_r and t_r must have the same length')

        ema_trees, t_i, gamma_i = [], [], []
        for ckpt in ckpts:
            state = load_checkpoint(ckpt)
            if state_key is not None and state_key in state:
                state = state[state_key]
            for s in self.sigma_rels:
                key = str(s)
                if key not in state['ema_params']:
                    raise ValueError('no averaged parameters for '
                                     f'sigma_rel={s} in {ckpt}')
                ema_trees.append(state['ema_params'][key])
                t_i.append(int(state['num_updates']))
                gamma_i.append(self.gammas[s])

        if t_r is None:
            t_r = [max(t_i)] * len(sigma_rel_r)
        gamma_r = [self.sigma_rel_to_gamma(s) for s in sigma_rel_r]
        weights = self.solve_weights(t_i, gamma_i, t_r, gamma_r)

        profiles = []
        for col in range(weights.shape[1]):
            w = weights[:, col]
            profile = jax.tree.map(
                lambda *leaves: sum(
                    wi * np.asarray(leaf) for wi, leaf in zip(w, leaves)
                ),
                *ema_trees,
            )
            profiles.append(profile)

        return profiles[0] if scalar_input and len(profiles) == 1 \
            else profiles


def post_hoc_ema(ckpts_or_ckpt_dir, sigma_rels, sigma_rel_r, **kwargs):
    """Convenience wrapper around ``EMAKarras.post_hoc_ema``."""
    return EMAKarras(sigma_rels).post_hoc_ema(
        ckpts_or_ckpt_dir, sigma_rel_r, **kwargs
    )
