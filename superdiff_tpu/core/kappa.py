"""Mixing-weight (kappa) policies for superposing diffusion models.

Three operators (reference: arXiv:2412.17762):

* **OR** — logical density mixing: kappa is a softmax over the running
  Itô log-likelihoods with temperature ``T`` and bias ``logp``
  (``applications/images/clip_eval.py:402``,
  ``applications/proteins/superdiff/composition.py:422-434``). The CIFAR
  stack uses the N-model generalization with a hard-max temperature of 1e6
  (``cifar/dynamics.py:90``).

* **AND** — concept interpolation: kappa solved in closed form so the
  instantaneous density change is equal under both models, with a ``lift``
  bias (``clip_eval.py:384-386,398-400``, ``composition.py:378-420``).

* **FIXED** — constant kappa (averaged baseline; ``clip_eval.py:417-419``,
  ``cifar/dynamics.py:140-173``).

All policies operate on float32 accumulators; the OR softmax at high
temperature is effectively an argmax and must not see bf16 rounding noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def or_weights(logq: Array, temperature: float = 1e6) -> Array:
    """N-model OR weights: ``softmax(T * logq)`` along the last axis.

    With the reference's T=1e6 this is a smooth argmax over the running
    log-likelihoods (``cifar/dynamics.py:90,124``). Input (B, N) -> (B, N).
    """
    return jax.nn.softmax(temperature * logq.astype(jnp.float32), axis=-1)


def kappa_or(ll_a: Array, ll_b: Array, temperature: float = 1.0, logp: float = 0.0) -> Array:
    """Two-model OR kappa: weight on model *a*.

    ``softmax([T*(ll_a + logp), T*ll_b])[0]`` (``clip_eval.py:402``;
    ``composition.py:433``). Shapes broadcast; returns same shape as inputs.
    """
    a = temperature * (ll_a.astype(jnp.float32) + logp)
    b = temperature * ll_b.astype(jnp.float32)
    m = jnp.maximum(a, b)
    ea, eb = jnp.exp(a - m), jnp.exp(b - m)
    return ea / (ea + eb)


def _sum_event(x: Array) -> Array:
    return jnp.sum(x.astype(jnp.float32), axis=tuple(range(1, x.ndim)))


def kappa_and_sde(
    vel_a: Array,  # (B, *event) velocity of model a (the one kappa weights)
    vel_b: Array,
    dx_ind: Array,  # (B, *event) the step model-b-alone would have taken (w/ noise)
    sigma: Array,
    dsigma: Array,
    guidance_scale: float,
    num_steps: int,
    lift: float = 0.0,
) -> Array:
    """Closed-form AND kappa for the sigma-space SDE (``clip_eval.py:398-400``):

      kappa = [ sum(|dsigma| (v_b - v_a)(v_b + v_a)) - sum(dx_ind (v_a - v_b))
                + sigma * lift / num_steps ]
              / [ 2 dsigma g sum((v_a - v_b)^2) ]

    Derived by equating the divergence-free dll increments of both models
    under the mixed field. Returns (B,).
    """
    d = vel_a - vel_b
    num = jnp.abs(dsigma) * _sum_event((vel_b - vel_a) * (vel_b + vel_a))
    num = num - _sum_event(dx_ind * d) + sigma * lift / num_steps
    den = 2.0 * dsigma * guidance_scale * _sum_event(d**2)
    return num / den


def kappa_and_ode(
    vel_a: Array,
    vel_b: Array,
    div_a: Array,  # (B,) Hutchinson divergence terms (reference sign)
    div_b: Array,
    vel_uncond: Array,
    sigma: Array,
    dsigma: Array,
    guidance_scale: float,
    num_steps: int,
    lift: float = 0.0,
) -> Array:
    """Closed-form AND kappa for the sigma-space probability-flow ODE
    (``clip_eval.py:384-386``). Returns (B,)."""
    d = vel_a - vel_b
    base = vel_uncond + guidance_scale * (vel_b - vel_uncond)
    num = sigma * (div_a - div_b) + _sum_event(d * (vel_a + vel_b))
    num = num + lift / dsigma * sigma / num_steps
    num = num - _sum_event(d * base)
    den = guidance_scale * _sum_event(d**2)
    return num / den


def kappa_and_generic(
    score_a: Array,  # (B, *event) score of model a in native (e.g. R3/SO3) space
    score_b: Array,
    dx_ind: Array,  # step model b alone would take (with noise)
    f_x: Array,  # drift evaluated at x (0 for driftless components)
    beta_t: Array,
    dt: Array,
    num_steps: int,
    logp: float = 0.0,
    sigma_weight: Array | None = None,
) -> Array:
    """Closed-form AND kappa for a generic reverse SDE component.

    Rebuild of the protein ``kappa_AND`` (``composition.py:378-420``): the
    numerator equates the divergence-free dll increments of the two models;
    ``logp * sigma_weight / num_steps`` is the normalized-sigma lift bias.
    Computed in float64-on-demand in the reference (``composition.py:
    379-380``); here float32 suffices because ``d = a - b`` is formed
    elementwise FIRST (no difference-of-large-sums ever exists) and XLA
    reduces with tree summation — measured max |kappa_fp32 - kappa_fp64|
    ~1e-4 across full-schedule sweeps at N=512 including near-degenerate
    model agreement (``tests/test_kappa_precision.py``).
    Returns a scalar per batch element (B,).
    """
    a = score_a.astype(jnp.float32)
    b = score_b.astype(jnp.float32)
    d = a - b
    kappa = -dt * beta_t * _sum_event(d * (a + b))
    kappa = kappa + _sum_event((dx_ind + dt * f_x) * d)
    den = 2.0 * dt * beta_t * _sum_event(d**2)
    out = -kappa / den
    if sigma_weight is not None:
        out = out + (logp * sigma_weight / num_steps) / den
    return out


def normalized_log_sigma(sigma_t: Array, sigma_min: float, sigma_max: float, dim: int) -> Array:
    """Sigma-normalized lift weight used by the protein AND operator
    (``composition.py:395-398``): ``-0.5 d log(sigma)`` min-max normalized to
    [0, 1] over the schedule's sigma range."""
    s = -0.5 * dim * jnp.log(sigma_t)
    lo = -0.5 * dim * jnp.log(sigma_max)
    hi = -0.5 * dim * jnp.log(sigma_min)
    return (s - lo) / (hi - lo)
