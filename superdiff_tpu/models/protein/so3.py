"""IGSO(3) diffuser on TPU: device-resident tables, gather-based lookups.

Rebuild of the reference ``SO3Diffuser`` (``se3diff_data/so3_diffuser.py``):
the isotropic Gaussian on SO(3) with logarithmic sigma schedule
``sigma(t) = log(t e^{s_max} + (1-t) e^{s_min})``. The reference precomputes
pdf/cdf/score-norm tables with numpy and does ``np.interp`` on host per step
(``so3_diffuser.py:137-176,217-233``); here the tables are computed once on
host at construction and then live on device — score lookup and inverse-CDF
sampling are vmapped gathers inside the jitted sampler (SURVEY.md §7
"IGSO(3) on TPU").

Config defaults match ``superdiff/config/composition.yaml:145-152``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def igso3_expansion(omega: np.ndarray, sigma: np.ndarray, L: int = 1000) -> np.ndarray:
    """Truncated IGSO(3) power series f(omega; sigma) (Leach et al. 2022,
    sigma reparameterized so t = sigma^2 matches Brownian motion)."""
    ls = np.arange(L)[None, :]
    om = omega[:, None]
    s2 = (sigma**2) if np.isscalar(sigma) else (sigma**2)
    p = (2 * ls + 1) * np.exp(-ls * (ls + 1) * s2 / 2.0)
    p = p * np.sin(om * (ls + 0.5)) / np.sin(om / 2.0)
    return p.sum(axis=-1)


def igso3_score_over_omega(exp_vals: np.ndarray, omega: np.ndarray, sigma: float, L: int = 1000) -> np.ndarray:
    """d/d omega log f(omega; sigma), quotient rule over the series."""
    ls = np.arange(L)[None, :]
    om = omega[:, None]
    hi = np.sin(om * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(om * (ls + 0.5))
    lo = np.sin(om / 2.0)
    dlo = 0.5 * np.cos(om / 2.0)
    dexp = (2 * ls + 1) * np.exp(-ls * (ls + 1) * sigma**2 / 2.0)
    dexp = dexp * (lo * dhi - hi * dlo) / lo**2
    return dexp.sum(axis=-1) / (exp_vals + 1e-4)


@dataclasses.dataclass(frozen=True)
class IGSO3Tables:
    """Device-resident lookup tables over (sigma-grid, omega-grid)."""

    omegas: Array  # (num_omega,)
    sigmas: Array  # (num_sigma,)
    cdf: Array  # (num_sigma, num_omega)
    score_norm: Array  # (num_sigma, num_omega)
    score_scaling_table: Array  # (num_sigma,)


class SO3Diffuser:
    """IGSO(3) diffusion with device-side lookups; jit/vmap-safe methods."""

    def __init__(
        self,
        min_sigma: float = 0.1,
        max_sigma: float = 1.5,
        num_sigma: int = 1000,
        num_omega: int = 1000,
        L: int = 1000,
    ):
        self.min_sigma = float(min_sigma)
        self.max_sigma = float(max_sigma)
        self.num_sigma = num_sigma
        omegas = np.linspace(0, np.pi, num_omega + 1)[1:]
        sigma_grid = np.asarray(
            [self._sigma_np(t) for t in np.linspace(0.0, 1.0, num_sigma)]
        )
        exp_vals = np.asarray([igso3_expansion(omegas, s, L) for s in sigma_grid])
        pdf = exp_vals * (1 - np.cos(omegas)[None]) / np.pi
        cdf = pdf.cumsum(axis=-1) / num_omega * np.pi
        score_norm = np.asarray(
            [igso3_score_over_omega(exp_vals[i], omegas, s, L) for i, s in enumerate(sigma_grid)]
        )
        score_scaling = np.sqrt(
            np.abs((score_norm**2 * pdf).sum(-1) / pdf.sum(-1))
        ) / np.sqrt(3.0)
        self.tables = IGSO3Tables(
            omegas=jnp.asarray(omegas, jnp.float32),
            sigmas=jnp.asarray(sigma_grid, jnp.float32),
            cdf=jnp.asarray(cdf, jnp.float32),
            score_norm=jnp.asarray(score_norm, jnp.float32),
            score_scaling_table=jnp.asarray(score_scaling, jnp.float32),
        )

    # -- schedule -------------------------------------------------------
    def _sigma_np(self, t: float) -> float:
        return float(
            np.log(t * np.exp(self.max_sigma) + (1 - t) * np.exp(self.min_sigma))
        )

    def sigma(self, t):
        return jnp.log(
            t * jnp.exp(self.max_sigma) + (1.0 - t) * jnp.exp(self.min_sigma)
        )

    def diffusion_coef(self, t):
        """g(t) for the logarithmic schedule (``so3_diffuser.py:203-211``)."""
        s = self.sigma(t)
        return jnp.sqrt(
            2.0 * (jnp.exp(self.max_sigma) - jnp.exp(self.min_sigma)) * s / jnp.exp(s)
        )

    def t_to_idx(self, t):
        """Continuous t -> index into the (non-uniform) sigma grid;
        ``np.digitize(sigma, grid) - 1`` semantics (``so3_diffuser.py:191``)."""
        s = self.sigma(t)
        idx = jnp.searchsorted(self.tables.sigmas, s, side="right") - 1
        return jnp.clip(idx, 0, self.num_sigma - 1)

    # -- score ----------------------------------------------------------
    def score(self, rotvec: Array, t, eps: float = 1e-6) -> Array:
        """Score of the IGSO(3) density at axis-angle ``rotvec`` (..., 3).

        Table lookup with linear interpolation over the omega grid — a
        strict accuracy improvement over the reference's piecewise-constant
        bucketize (``so3_diffuser.py:294-307``) at identical device cost.
        ``t`` may be scalar or any shape broadcastable to ``rotvec[..., 0]``
        (per-batch times, as the score-network heads pass). The angle uses a
        smoothed norm so the gradient is finite at rotvec = 0 (the identity
        relative rotation a zero-init score head produces)."""
        omega = jnp.sqrt(jnp.sum(rotvec * rotvec, axis=-1) + eps * eps)  # (...)
        rows = self.tables.score_norm[self.t_to_idx(jnp.asarray(t))]
        rows = jnp.broadcast_to(rows, omega.shape + rows.shape[-1:])
        omegas = self.tables.omegas
        oidx = jnp.clip(jnp.searchsorted(omegas, omega) - 1, 0, omegas.shape[0] - 2)
        x0, x1 = omegas[oidx], omegas[oidx + 1]
        y0 = jnp.take_along_axis(rows, oidx[..., None], axis=-1)[..., 0]
        y1 = jnp.take_along_axis(rows, (oidx + 1)[..., None], axis=-1)[..., 0]
        w = jnp.clip((omega - x0) / (x1 - x0), 0.0, 1.0)
        norm = y0 + w * (y1 - y0)
        return norm[..., None] * rotvec / (omega[..., None] + eps)

    def score_scaling(self, t):
        return self.tables.score_scaling_table[self.t_to_idx(t)]

    # -- sampling -------------------------------------------------------
    def sample(self, key: Array, t, shape) -> Array:
        """Sample axis-angle rotations from IGSO(3) via inverse CDF.

        ``t`` may be scalar or broadcastable to ``shape`` (per-sample times,
        as SE(3) DSM training draws); the inverse-CDF interpolation is done
        row-wise with gathers (batched ``np.interp`` equivalent).
        """
        k1, k2 = jax.random.split(key)
        axis = jax.random.normal(k1, shape + (3,))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True).clip(1e-12)
        u = jax.random.uniform(k2, shape)
        rows = self.tables.cdf[self.t_to_idx(jnp.asarray(t))]
        rows = jnp.broadcast_to(rows, shape + rows.shape[-1:])
        # inverse CDF: index of the first grid point with cdf >= u
        idx = jnp.sum((rows < u[..., None]).astype(jnp.int32), axis=-1)
        idx = jnp.clip(idx, 1, rows.shape[-1] - 1)
        c0 = jnp.take_along_axis(rows, (idx - 1)[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(rows, idx[..., None], axis=-1)[..., 0]
        o0, o1 = self.tables.omegas[idx - 1], self.tables.omegas[idx]
        w = jnp.clip((u - c0) / jnp.maximum(c1 - c0, 1e-12), 0.0, 1.0)
        angle = o0 + w * (o1 - o0)
        return axis * angle[..., None]

    def sample_ref(self, key: Array, shape) -> Array:
        return self.sample(key, jnp.asarray(1.0), shape)

    # -- reverse step ---------------------------------------------------
    def reverse_perturbation(
        self, key, score_t: Array, t, dt, *, stochastic: bool, noise_scale: float = 1.0
    ) -> Array:
        """Tangent update of the geodesic random walk
        (``so3_diffuser.py:355-366``); compose with ``rigid.rotvec_compose``."""
        g = self.diffusion_coef(t)
        if stochastic:
            z = noise_scale * jax.random.normal(key, score_t.shape)
            return g**2 * score_t * dt + g * jnp.sqrt(dt) * z
        return (1.0 - 0.5 * noise_scale**2) * g**2 * score_t * dt
