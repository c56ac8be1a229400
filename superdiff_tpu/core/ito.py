"""Itô density estimators — the mathematical core of SuperDiff.

Along a reverse trajectory ``x_{t+dt} = x_t + dx``, each pre-trained model i
defines a marginal density ``q_i``; SuperDiff tracks the *running change*
``dlog q_i(x_t)`` and uses the accumulated values to weight the models.

Two flavors, both rebuilt here once (the reference re-implements them four
times: ``cifar/dynamics.py``, ``applications/images/clip_eval.py``,
``applications/proteins/superdiff/composition.py``, and the edu notebook):

* **SDE / divergence-free** — the Itô expansion of ``log q_i`` under the
  reverse SDE needs only the score and the realized step ``dx``; no
  divergence. Exact discrete form of the CIFAR stack at
  ``cifar/dynamics.py:131-134``; sigma-space SD form at
  ``applications/images/clip_eval.py:409-413``; R3/SO(3) form at
  ``applications/proteins/superdiff/composition.py:332-356``.

* **ODE / Hutchinson** — the continuity equation
  ``d log q_i = (div v_i) dt' + <grad log q_i, dx - v_i dt'>`` with the
  divergence estimated by a Rademacher-probe JVP
  (``cifar/dynamics.py:85-94``, ``clip_eval.py:98-101``).

All reductions run in float32 regardless of the model compute dtype: the OR
operator's high-temperature softmax is an argmax in disguise and is sensitive
to accumulated noise in the running log-likelihoods (see SURVEY.md §7).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Axes of a (batch, *event) tensor that constitute the event (summed over).
def _event_axes(x: Array) -> Tuple[int, ...]:
    return tuple(range(1, x.ndim))


def _fsum(x: Array, axes) -> Array:
    """Reduce in float32 for numerically stable log-likelihood accumulation."""
    return jnp.sum(x.astype(jnp.float32), axis=axes)


def rademacher(key: jax.Array, shape, dtype=jnp.float32) -> Array:
    """Rademacher probe (+/-1) for Hutchinson divergence estimation.

    Matches the reference's construction ``randint(0,2)*2-1``
    (``cifar/dynamics.py:83``).
    """
    return jax.random.randint(key, shape, 0, 2).astype(dtype) * 2.0 - 1.0


def hutchinson_div(
    fn: Callable[[Array], Array], x: Array, probe: Array
) -> Tuple[Array, Array]:
    """Divergence estimate ``E[eps^T (dfn/dx) eps]`` via a single JVP.

    Returns ``(fn(x), sum(probe * jvp(fn, x, probe), event_axes))``.
    ``jax.jvp`` through dot-product attention is native on TPU — no need for
    the flash-attention workaround the reference applies
    (``clip_eval.py:97``, ``sdpa_kernel(SDPBackend.MATH)``).
    """
    val, tangent = jax.jvp(fn, (x,), (probe,))
    return val, _fsum(probe * tangent, _event_axes(x))


# ---------------------------------------------------------------------------
# SDE (divergence-free) estimators
# ---------------------------------------------------------------------------


def dlogq_sde_vp(
    sscores: Array,  # (N, B, *event): per-model sigma-scaled scores s_i
    x: Array,  # (B, *event)
    dx: Array,  # (B, *event): realized EM step (includes noise)
    t: Array,
    dt: Array,
    schedule,
) -> Array:
    """Discrete divergence-free ``dlog q_i`` for the VP reverse SDE.

    Bit-parity rebuild of ``cifar/dynamics.py:131-134``: the log-ratio of the
    Gaussian transition kernels of model i's reverse SDE evaluated at the
    realized step, expanded as a difference of squares:

      dlogq_i = (f(x+dx) - v_i) * (dt*v_i + 2*dx + dt*f(x+dx)) / (4*sigma*beta)

    with ``f(y) = dlog_alpha/dt * y`` and ``v_i = f(x) - 2 beta s_i``.
    Returns (B, N) — per-sample, per-model increments (fp32).
    """
    da = schedule.dlog_alpha_dt(t)
    beta = schedule.beta(t)
    sigma = schedule.sigma(t)
    v = da * x[None] - 2.0 * beta * sscores  # (N, B, *event)
    f_next = da * (x + dx)[None]
    num = (f_next - v) * (dt * v + 2.0 * dx[None] + dt * f_next)
    out = _fsum(num, tuple(a + 1 for a in _event_axes(x))) / (4.0 * sigma * beta)
    return out.T  # (B, N)


def dlogq_sde_sigma_space(
    vels: Array,  # (N, B, *event): per-model velocities v_i = -sigma * score_i
    dx: Array,  # (B, *event): realized step
    sigma: Array,
    dsigma: Array,
) -> Array:
    """Divergence-free ``dlog q_i`` in sigma-space (Stable-Diffusion form).

    Rebuild of ``applications/images/clip_eval.py:409-413`` ("and"/"avg"):
      dll_i = sum( -|dsigma|/sigma * v_i^2 - dx * v_i / sigma )
    Returns (B, N).
    """
    ev = tuple(a + 1 for a in _event_axes(dx))
    out = _fsum(-jnp.abs(dsigma) / sigma * vels**2 - dx[None] * vels / sigma, ev)
    return out.T


def dlogq_sde_sigma_space_or(
    vels: Array, dx: Array, sigma: Array, dsigma: Array
) -> Array:
    """OR-variant of the sigma-space estimator (``clip_eval.py:412-413``):
      dll_i = -sum( v_i * (dx + dsigma * v_i) ) / sigma
    Returns (B, N).
    """
    ev = tuple(a + 1 for a in _event_axes(dx))
    out = -_fsum(vels * (dx[None] + dsigma * vels), ev) / sigma
    return out.T


def dlogq_sde_r3(
    scores: Array,  # (N, B, *event)
    x: Array,
    dx: Array,
    f_x: Array,  # drift f(x, t)
    beta_t: Array,
    dlog_alpha_dt: Array,
    dt: Array,
) -> Array:
    """Divergence-free ``dlog q_i`` for a generic Euclidean reverse SDE.

    Rebuild of the protein translation component
    (``applications/proteins/superdiff/composition.py:339-347``):
      dll_i = ndim * dt * dlog_alpha_dt - dt * beta * score_i^2
              + (dx + dt * f_x) * score_i        (summed over event)
    Returns (B, N).
    """
    ev = tuple(a + 1 for a in _event_axes(x))
    ndim = 1
    for a in _event_axes(x):
        ndim *= x.shape[a]
    per = -dt * beta_t * scores**2 + (dx + dt * f_x)[None] * scores
    out = _fsum(per, ev) + ndim * dt * dlog_alpha_dt
    return out.T


def dlogq_sde_driftless(
    scores: Array, dx: Array, beta_t: Array, dt: Array
) -> Array:
    """Divergence-free ``dlog q_i`` for a driftless (e.g. SO(3)) reverse SDE.

    Rebuild of the protein rotation component (``composition.py:348-353``):
      dll_i = sum( -dt * beta * score_i^2 + dx * score_i )
    Returns (B, N).
    """
    ev = tuple(a + 1 for a in _event_axes(dx))
    out = _fsum(-dt * beta_t * scores**2 + dx[None] * scores, ev)
    return out.T


# ---------------------------------------------------------------------------
# ODE (Hutchinson) estimators
# ---------------------------------------------------------------------------


def dlogq_ode_vp(
    sscores: Array,  # (N, B, *event)
    divs: Array,  # (N, B): Hutchinson estimates of sum(probe * d(s_i)/dx probe)
    x: Array,
    dx: Array,  # realized (deterministic) step
    t: Array,
    dt: Array,
    schedule,
    score_eps: float = 1e-3,
) -> Array:
    """Continuity-equation ``dlog q_i`` for the VP probability-flow ODE.

    Rebuild of ``cifar/dynamics.py:86-94``:
      vf_i    = dlog_alpha_dt * x - beta * s_i       (positive-time field)
      div_i   = -beta * hutchinson(s_i)
      dlogq_i = dt * div_i + < s_i / (t + eps), dx + dt * vf_i >
    (the realized step is ``dx = -dt * mixed_vf``). Returns (B, N).
    """
    da = schedule.dlog_alpha_dt(t)
    beta = schedule.beta(t)
    vf = da * x[None] - beta * sscores
    div = -beta * divs  # (N, B)
    grad_logq = sscores / (schedule.sigma(t) + score_eps)
    ev = tuple(a + 1 for a in _event_axes(x))
    out = dt * div + _fsum(grad_logq * (dx[None] + dt * vf), ev)
    return out.T


def dlogq_ode_sigma_space(
    vels: Array,  # (N, B, *event)
    divs: Array,  # (N, B): hutchinson of velocity jacobian
    vf_mixed: Array,  # (B, *event): the mixed field actually integrated
    sigma: Array,
    dsigma: Array,
) -> Array:
    """Continuity-equation ``dlog q_i`` in sigma-space (``clip_eval.py:390-391``):
      dll_i = dsigma * ( -div_i - < -v_i/sigma, v_i - vf_mixed > )
    where ``div_i`` here carries the reference's sign convention
    (``get_vel`` returns ``-(eps * jvp).sum``). Returns (B, N).
    """
    ev = tuple(a + 1 for a in _event_axes(vf_mixed))
    corr = _fsum((-vels / sigma) * (vels - vf_mixed[None]), ev)
    return (dsigma * (divs - corr)).T


def renormalize_logq(logq: Array) -> Array:
    """Subtract the per-sample max across models (``dynamics.py:94``).

    Keeps the running accumulators bounded; a softmax over ``logq`` is
    invariant to this shift.
    """
    return logq - jnp.max(logq, axis=-1, keepdims=True)
