"""Reverse-SDE samplers as lax.scan loops (jit-compiled end to end).

Registry mirrors the reference (brever/models/sgmse/solvers.py:8-77):
``pc`` (predictor-corrector with annealed Langevin corrector) and
``edm`` (Heun 2nd order with optional stochastic churn).

TPU design: the per-step time/sigma grids are precomputed arrays and
the loop body is a ``lax.scan`` carrying (x, rng) — one compilation for
the whole sampler regardless of step count; step-count changes only
change the scan length. Churn gating (smin <= sigma <= smax) is a
``jnp.where`` instead of data-dependent Python control flow.
"""

import jax
import jax.numpy as jnp

from ...registry import Registry
from .sdes import _randn_like

SolverRegistry = Registry('solver')


@SolverRegistry.register('edm')
class EDMSolver:
    """Heun 2nd-order sampler with stochastic churn (Karras 2022)."""

    def __init__(self, num_steps, schurn, smin, smax, snoise, **kwargs):
        self.num_steps = num_steps
        self.schurn = schurn
        self.smin = smin
        self.smax = smax
        self.snoise = snoise
        self._gamma = min(schurn / num_steps, 2**0.5 - 1)

    def __call__(self, sde, y, model, rng):
        t_grid = jnp.linspace(1.0, 0.0, self.num_steps + 1)
        sigma_grid = sde.sigma(t_grid)
        rng, prior_rng = jax.random.split(rng)
        x = sde.prior(y, prior_rng)

        def body(carry, idx):
            x, rng = carry
            rng, eps_rng = jax.random.split(rng)
            t_i = t_grid[idx]
            t_next = t_grid[idx + 1]
            sigma_i = sigma_grid[idx]
            sigma_next = sigma_grid[idx + 1]

            eps = self.snoise * _randn_like(eps_rng, x)
            gamma = jnp.where(
                (self.smin <= sigma_i) & (sigma_i <= self.smax),
                self._gamma, 0.0)
            sigma_hat = sigma_i * (1 + gamma)
            t_hat = sde.sigma_inv(sigma_hat)
            x_hat = sde.s(t_hat) / sde.s(t_i) * (x - y) + y \
                + sde.s(t_hat) * jnp.sqrt(
                    jnp.maximum(sigma_hat**2 - sigma_i**2, 0.0)) * eps

            x_tilde = (x_hat - y) / sde.s(t_hat)
            score = model.score(x_tilde, y, sigma_hat, t_hat)
            d_hat = sde.probability_flow(x_hat, y, score, t_hat)
            x_euler = x_hat + (t_next - t_hat) * d_hat

            # Heun correction on every step but the last
            x_tilde2 = (x_euler - y) / sde.s(t_next)
            score2 = model.score(x_tilde2, y, sigma_next, t_next)
            d_next = sde.probability_flow(x_euler, y, score2, t_next)
            x_heun = x_hat + 0.5 * (t_next - t_hat) * (d_hat + d_next)

            is_last = idx == self.num_steps - 1
            x = jnp.where(is_last, x_euler, x_heun)
            return (x, rng), None

        (x, _), _ = jax.lax.scan(
            body, (x, rng), jnp.arange(self.num_steps))
        nfe = 2 * self.num_steps
        return x, nfe


@SolverRegistry.register('pc')
class PCSolver:
    """Predictor-corrector: annealed-Langevin corrector + reverse step."""

    def __init__(self, num_steps, corrector_steps, corrector_snr, **kwargs):
        self.num_steps = num_steps
        self.corrector_steps = corrector_steps
        self.corrector_snr = corrector_snr

    def __call__(self, sde, y, model, rng):
        dt = -1.0 / self.num_steps
        t_grid = jnp.arange(1.0, 0.0, dt)
        sigma_grid = sde.sigma(t_grid)
        eps_grid = 2 * (self.corrector_snr * sde.s(t_grid) * sigma_grid)**2
        rng, prior_rng = jax.random.split(rng)
        x = sde.prior(y, prior_rng)

        def body(carry, idx):
            x, rng = carry
            t_i = t_grid[idx]
            sigma_i = sigma_grid[idx]
            eps_i = eps_grid[idx]

            for _ in range(self.corrector_steps):
                rng, noise_rng = jax.random.split(rng)
                x_tilde = (x - y) / sde.s(t_i)
                score = model.score(x_tilde, y, sigma_i, t_i)
                x = x + eps_i * score \
                    + jnp.sqrt(2 * eps_i) * _randn_like(noise_rng, x)

            rng, step_rng = jax.random.split(rng)
            x_tilde = (x - y) / sde.s(t_i)
            score = model.score(x_tilde, y, sigma_i, t_i)
            is_last = idx == self.num_steps - 1
            noisy = x + sde.reverse_step(x, y, score, t_i, dt, step_rng)
            deterministic = x + dt * sde.probability_flow(x, y, score, t_i)
            x = jnp.where(is_last, deterministic, noisy)
            return (x, rng), None

        (x, _), _ = jax.lax.scan(
            body, (x, rng), jnp.arange(self.num_steps))
        nfe = self.num_steps * (self.corrector_steps + 1)
        return x, nfe
