"""Forward+reverse ODE log-likelihood in sigma-space (Stable Diffusion).

Rebuild of ``applications/images/clip_eval.py:161-285`` (``get_ll_ode`` /
``get_ll_ode_guidance``): encode an image's latent forward along the
probability-flow ODE to the sigma-max endpoint, score it under the Gaussian
base measure, then integrate back accumulating the continuity-equation
``dlog q`` — the full density estimate used to sanity-check the Itô
estimator. Both loops are single ``lax.scan`` programs.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import ito
from ..core.schedules import SigmaGrid

Array = jax.Array


def gaussian_base_logp(latents_unit: Array, init_noise_sigma: float) -> Array:
    """log N(x; 0, init_noise_sigma^2 I) with the reference's normalization
    convention (``clip_eval.py:194-196``)."""
    d = 1
    for a in latents_unit.shape[1:]:
        d *= a
    ll = -d / 2.0 * (jnp.log(2 * jnp.pi) - jnp.log(init_noise_sigma**2))
    ll = ll - (1.0 / init_noise_sigma**2) * jnp.sum(
        (latents_unit * init_noise_sigma) ** 2, axis=tuple(range(1, latents_unit.ndim))
    )
    return ll


def ode_nll(
    vel_fn: Callable[[Array, Array, Array, Array], Array],
    ctx: Array,
    latents0: Array,
    grid: SigmaGrid,
    key: Array,
    guidance: Optional[Tuple[Array, Array, float]] = None,
) -> dict:
    """Round-trip ODE log-likelihood of data-space latents.

    ``vel_fn(x, t, sigma, ctx)`` is the velocity oracle. With ``guidance``
    = (ctx_obj, ctx_unc, g), the trajectory integrates the CFG field while
    the dll tracks the conditional model (``get_ll_ode_guidance``).
    Returns dict with ll (adjusted by base measure), ll_path, latents_end.
    """
    timesteps, sigmas = grid.as_arrays()
    n = timesteps.shape[0]

    def div_vel(x, t, sigma, c, probe):
        def f(_x):
            return vel_fn(_x, t, sigma, c)

        val, tan = jax.jvp(f, (x,), (probe,))
        div = -jnp.sum(
            (probe * tan).astype(jnp.float32), axis=tuple(range(1, x.ndim))
        )
        return val, div

    def forward_body(carry, i):
        x, ll = carry
        j = n - 1 - i  # reversed grid: integrate sigma upward
        sigma = sigmas[j]
        dsigma = sigmas[j] - sigmas[j + 1]  # positive
        t = timesteps[j]
        probe = ito.rademacher(jax.random.fold_in(key, i), x.shape, x.dtype)
        if guidance is None:
            vf, div = div_vel(x, t, sigma, ctx, probe)
            x = x + dsigma * vf
            ll = ll - jnp.abs(dsigma) * div
        else:
            ctx_obj, ctx_unc, g = guidance
            v_obj = vel_fn(x, t, sigma, ctx_obj)
            v_unc = vel_fn(x, t, sigma, ctx_unc)
            x = x + dsigma * (v_unc + g * (v_obj - v_unc))
            ll = ll
        return (x, ll), ()

    ll0 = jnp.zeros(latents0.shape[0], jnp.float32)
    (x_end, ll_fwd), _ = jax.lax.scan(forward_body, (latents0, ll0), jnp.arange(n))

    x_unit = x_end / grid.init_noise_sigma
    ll_q0 = gaussian_base_logp(x_unit, grid.init_noise_sigma)
    x = x_unit * grid.init_noise_sigma

    def reverse_body(carry, i):
        x, ll = carry
        sigma = sigmas[i]
        dsigma = sigmas[i + 1] - sigmas[i]
        t = timesteps[i]
        probe = ito.rademacher(jax.random.fold_in(key, n + i), x.shape, x.dtype)
        if guidance is None:
            vf, div = div_vel(x, t, sigma, ctx, probe)
            x = x + dsigma * vf
            ll = ll - jnp.abs(dsigma) * div
        else:
            ctx_obj, ctx_unc, g = guidance
            v_obj, div_obj = div_vel(x, t, sigma, ctx_obj, probe)
            v_unc = vel_fn(x, t, sigma, ctx_unc)
            vf = v_unc + g * (v_obj - v_unc)
            x = x + dsigma * vf
            corr = jnp.sum(
                ((-v_obj / sigma) * (v_obj - vf)).astype(jnp.float32),
                axis=tuple(range(1, x.ndim)),
            )
            ll = ll + (-jnp.abs(dsigma) * div_obj - jnp.abs(dsigma) * corr)
        return (x, ll), ()

    (x_back, ll_rev), _ = jax.lax.scan(reverse_body, (x, ll0), jnp.arange(n))
    return {
        "ll": ll_rev + ll_q0,
        "ll_path": ll_rev,
        "ll_forward_path": ll_fwd,
        "ll_base": ll_q0,
        "latents_end": x_back,
    }
