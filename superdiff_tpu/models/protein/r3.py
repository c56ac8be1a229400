"""R^3 VP-SDE diffuser for backbone translations, jnp end-to-end.

Rebuild of the reference ``R3Diffuser`` (``se3diff_data/r3_diffuser.py``):
linear beta schedule ``b(t) = min_b + t (max_b - min_b)``, drift
``f(x,t) = -b(t) x / 2``, diffusion ``g(t) = sqrt(b(t))``, coordinate
scaling 0.1 (config ``composition.yaml:139-142``). All methods are scalar-t,
batched-x, jit/vmap-safe.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class R3Diffuser:
    min_b: float = 0.1
    max_b: float = 20.0
    coordinate_scaling: float = 0.1

    def scale(self, x):
        return x * self.coordinate_scaling

    def unscale(self, x):
        return x / self.coordinate_scaling

    def b_t(self, t):
        return self.min_b + t * (self.max_b - self.min_b)

    def marginal_b_t(self, t):
        return t * self.min_b + 0.5 * t**2 * (self.max_b - self.min_b)

    def diffusion_coef(self, t):
        return jnp.sqrt(self.b_t(t))

    def drift_coef(self, x, t):
        return -0.5 * self.b_t(t) * x

    def conditional_var(self, t):
        return 1.0 - jnp.exp(-self.marginal_b_t(t))

    def score_scaling(self, t):
        return 1.0 / jnp.sqrt(self.conditional_var(t))

    def score(self, x_t, x_0, t, scaled: bool = True):
        """Score of p(x_t | x_0); inputs in scaled coordinates unless noted."""
        if not scaled:
            x_t, x_0 = self.scale(x_t), self.scale(x_0)
        return -(x_t - jnp.exp(-0.5 * self.marginal_b_t(t)) * x_0) / self.conditional_var(t)

    def calc_trans_score(self, trans_t, trans_0, t):
        """Score from a predicted clean translation (the Proteus adapter path,
        ``composition.py:72-78``). Unscaled angstrom inputs."""
        return self.score(trans_t, trans_0, t, scaled=False)

    def forward_marginal(self, key, x_0, t):
        """Sample p(x_t | x_0); returns (x_t unscaled, score in scaled space)."""
        x_0s = self.scale(x_0)
        mean = jnp.exp(-0.5 * self.marginal_b_t(t)) * x_0s
        std = jnp.sqrt(self.conditional_var(t))
        x_t = mean + std * jax.random.normal(key, x_0s.shape)
        return self.unscale(x_t), self.score(x_t, x_0s, t)

    def sample_ref(self, key, shape):
        return jax.random.normal(key, shape + (3,))

    def reverse_perturbation(
        self, key, x_t_scaled, score_t, t, dt, *, stochastic: bool, noise_scale: float = 1.0
    ):
        """EM (or deterministic-ODE) update in scaled coordinates; sign
        convention: next = x - perturb (``r3_diffuser.py:135-155``)."""
        g = self.diffusion_coef(t)
        f = self.drift_coef(x_t_scaled, t)
        if stochastic:
            z = noise_scale * jax.random.normal(key, score_t.shape)
            return (f - g**2 * score_t) * dt + g * jnp.sqrt(dt) * z
        return (f - g**2 * score_t * (1.0 + 0.5 * noise_scale**2)) * dt
