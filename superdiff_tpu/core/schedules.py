"""Noise schedules for diffusion processes, TPU-first.

Every schedule is a pure, jit-safe dataclass of scalars: all methods are
closed-form functions of ``t`` (no table lookups, no Python branching), so the
XLA compiler folds them into the surrounding fused computation.

Behavioral parity targets (reference: mo-rsa24/super-diffusion):
  * ``VPSchedule`` reproduces the VP-SDE used by the CIFAR stack
    (``cifar/dynamics.py:15-27``): ``log_alpha(t) = -0.5 t b0 - 0.25 t^2 (b1-b0)``
    with the repo's *non-standard* linear sigma ``sigma(t) = t`` and
    ``beta(t) = 1 + 0.5 t b0 + 0.5 t^2 (b1 - b0)``.
  * ``CosineVPSchedule`` is the textbook VP sigma (commented out in the
    reference at ``cifar/dynamics.py:21``), provided for completeness.
  * ``KarrasSigmaSchedule`` reproduces diffusers' ``EulerDiscreteScheduler``
    sigma grid consumed by the Stable-Diffusion application
    (``applications/images/clip_eval.py:43,339-342``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VPSchedule:
    """Variance-preserving SDE with the reference's linear-sigma convention.

    Forward kernel: ``x_t = alpha(t) x_0 + sigma(t) eps``.
    Reverse SDE drift uses ``beta(t)`` as the score scaling.
    """

    beta_0: float = 0.1
    beta_1: float = 20.0

    def log_alpha(self, t):
        return -0.5 * t * self.beta_0 - 0.25 * t**2 * (self.beta_1 - self.beta_0)

    def alpha(self, t):
        return jnp.exp(self.log_alpha(t))

    def log_sigma(self, t):
        return jnp.log(t)

    def sigma(self, t):
        return t

    def dlog_alpha_dt(self, t):
        # d/dt [-0.5 t b0 - 0.25 t^2 (b1-b0)]
        return -0.5 * self.beta_0 - 0.5 * t * (self.beta_1 - self.beta_0)

    def dlog_sigma_dt(self, t):
        return 1.0 / t

    def beta(self, t):
        """Score-drift coefficient ``sigma_t^2 d/dt log(sigma_t / alpha_t)``.

        The reference hard-codes the expanded polynomial
        (``cifar/dynamics.py:27``); kept bit-identical here.
        """
        return 1.0 + 0.5 * t * self.beta_0 + 0.5 * t**2 * (self.beta_1 - self.beta_0)

    def marginal(self, x0, eps, t):
        """Forward diffusion sample ``x_t`` given data and noise."""
        return self.alpha(t) * x0 + self.sigma(t) * eps


@dataclasses.dataclass(frozen=True)
class CosineVPSchedule(VPSchedule):
    """Standard VP-SDE sigma: ``sigma^2 = 1 - alpha^2`` (textbook variant)."""

    def log_sigma(self, t):
        var = -jnp.expm1(-t * self.beta_0 - 0.5 * t**2 * (self.beta_1 - self.beta_0))
        return 0.5 * jnp.log(var)

    def sigma(self, t):
        return jnp.exp(self.log_sigma(t))

    def dlog_sigma_dt(self, t):
        b = self.beta_0 + t * (self.beta_1 - self.beta_0)
        e = jnp.exp(-t * self.beta_0 - 0.5 * t**2 * (self.beta_1 - self.beta_0))
        return 0.5 * b * e / (1.0 - e)

    def beta(self, t):
        return self.sigma(t) ** 2 * (self.dlog_sigma_dt(t) - self.dlog_alpha_dt(t))


def ddpm_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    """Discrete DDPM cumulative-alpha table (host-side, precomputed once)."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")
    return np.cumprod(1.0 - betas)


@dataclasses.dataclass(frozen=True)
class SigmaGrid:
    """Precomputed sigma grid for sigma-space (k-diffusion style) sampling.

    Mirrors the grid the Stable-Diffusion application integrates over
    (diffusers ``EulerDiscreteScheduler`` with ``timestep_spacing='linspace'``):
    continuous timesteps interpolated onto the discrete DDPM sigma table.

    Attributes:
      timesteps: float array [n] — UNet conditioning timesteps, descending.
      sigmas:    float array [n+1] — sigma at each step, terminal 0 appended.
      init_noise_sigma: scalar — initial latent scale, ``sqrt(s_max^2 + 1)``.
    """

    timesteps: Tuple[float, ...]
    sigmas: Tuple[float, ...]
    init_noise_sigma: float

    @staticmethod
    def euler_discrete(
        num_inference_steps: int,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
    ) -> "SigmaGrid":
        ac = ddpm_alphas_cumprod(num_train_timesteps, beta_start, beta_end, beta_schedule)
        full_sigmas = np.sqrt((1.0 - ac) / ac)
        ts = np.linspace(0, num_train_timesteps - 1, num_inference_steps, dtype=np.float64)[::-1]
        sig = np.interp(ts, np.arange(num_train_timesteps), full_sigmas)
        sig = np.concatenate([sig, [0.0]])
        init = float(np.sqrt(sig.max() ** 2 + 1.0))
        return SigmaGrid(
            timesteps=tuple(float(t) for t in ts),
            sigmas=tuple(float(s) for s in sig),
            init_noise_sigma=init,
        )

    def as_arrays(self, dtype=jnp.float32):
        return (
            jnp.asarray(self.timesteps, dtype=dtype),
            jnp.asarray(self.sigmas, dtype=dtype),
        )
