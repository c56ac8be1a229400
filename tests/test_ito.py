"""Analytic-Gaussian validation of the Itô density estimators (SURVEY.md §4c).

For Gaussian data ``x0 ~ N(mu, s^2 I)`` under the VP forward kernel the
marginal is ``q_t = N(alpha mu, alpha^2 s^2 + sigma^2)`` with an exact score,
so the accumulated estimator output can be checked against the closed-form
log-density difference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.core import (
    VPSchedule,
    SuperposeConfig,
    superpose,
    kappa_and_sde,
    kappa_or,
    dlogq_sde_sigma_space,
)

SCHED = VPSchedule()
DIM = 2


def gaussian_sscore_fn(mus, data_std=0.25):
    """Stacked oracle of exact sigma-scaled scores for N Gaussian components."""
    mus = jnp.asarray(mus, jnp.float32)  # (N, DIM)

    def score_fn(t, x):
        a, sig = SCHED.alpha(t), SCHED.sigma(t)
        var = a**2 * data_std**2 + sig**2
        return -sig * (x[None] - a * mus[:, None, :]) / var  # (N, B, DIM)

    return score_fn


def analytic_logq0(x, mu, data_std=0.25):
    var = data_std**2
    return -0.5 * jnp.sum((x - mu) ** 2, -1) / var - 0.5 * DIM * jnp.log(
        2 * jnp.pi * var
    )


def _run(mode):
    mus = [[2.0, 2.0], [-2.0, -2.0]]
    score_fn = gaussian_sscore_fn(mus)
    cfg = SuperposeConfig(n_steps=800, mode=mode, operator="or")
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (256, DIM))
    x0, logq, nfe = jax.jit(
        lambda k, x: superpose(k, x, score_fn, SCHED, cfg, n_models=2)
    )(key, x1)
    return np.asarray(x0), np.asarray(logq)


def test_sde_samples_land_on_modes():
    x0, logq = _run("sde")
    d_a = np.linalg.norm(x0 - np.array([2.0, 2.0]), axis=-1)
    d_b = np.linalg.norm(x0 + np.array([2.0, 2.0]), axis=-1)
    # every sample within a few data-stds of one of the two modes
    assert np.all(np.minimum(d_a, d_b) < 1.25), np.minimum(d_a, d_b).max()
    # both modes populated (OR samples from the mixture)
    frac_a = np.mean(d_a < d_b)
    assert 0.2 < frac_a < 0.8, frac_a


def test_sde_logq_tracks_analytic_density_ratio():
    """Delta of running log-likelihoods ~ analytic log q_A(x0) - log q_B(x0).

    The per-model max-renormalization cancels in the difference; the endpoint
    marginals at t=1 are near-identical, so the accumulated difference should
    match the data-space log-ratio at the final sample.
    """
    x0, logq = _run("sde")
    est = logq[:, 0] - logq[:, 1]
    ref = np.asarray(
        analytic_logq0(jnp.asarray(x0), jnp.asarray([2.0, 2.0]))
        - analytic_logq0(jnp.asarray(x0), jnp.asarray([-2.0, -2.0]))
    )
    # large-magnitude ratios: check sign agreement and relative accuracy
    assert np.mean(np.sign(est) == np.sign(ref)) > 0.99
    rel = np.abs(est - ref) / np.maximum(np.abs(ref), 1.0)
    assert np.median(rel) < 0.15, np.median(rel)


def test_ode_logq_tracks_analytic_density_ratio():
    x0, logq = _run("ode")
    est = logq[:, 0] - logq[:, 1]
    ref = np.asarray(
        analytic_logq0(jnp.asarray(x0), jnp.asarray([2.0, 2.0]))
        - analytic_logq0(jnp.asarray(x0), jnp.asarray([-2.0, -2.0]))
    )
    assert np.mean(np.sign(est) == np.sign(ref)) > 0.99
    rel = np.abs(est - ref) / np.maximum(np.abs(ref), 1.0)
    assert np.median(rel) < 0.15, np.median(rel)


def test_or_weights_commit():
    """OR at hard-max temperature commits to one model (edu notebook cell 24)."""
    _, logq = _run("sde")
    from superdiff_tpu.core import or_weights

    w = np.asarray(or_weights(jnp.asarray(logq)))
    assert np.all(np.max(w, axis=-1) > 0.999)


def test_kappa_or_semantics():
    ll_a = jnp.asarray([0.0, 5.0, -5.0])
    ll_b = jnp.asarray([0.0, 0.0, 0.0])
    k = kappa_or(ll_a, ll_b, temperature=1.0, logp=0.0)
    np.testing.assert_allclose(k[0], 0.5, atol=1e-6)
    assert k[1] > 0.99 and k[2] < 0.01
    # logp bias shifts the balance toward model a
    k_biased = kappa_or(ll_a, ll_b, temperature=1.0, logp=2.0)
    assert np.all(np.asarray(k_biased) > np.asarray(k))


def test_kappa_and_sde_equalizes_density_increments():
    """AND kappa solves for equal divergence-free dll under the mixed field
    (clip_eval.py:398-410)."""
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    shape = (4, 4, 4, 3)
    vel_a = jax.random.normal(ks[0], shape)
    vel_b = jax.random.normal(ks[1], shape)
    vel_u = jax.random.normal(ks[2], shape)
    noise_eps = jax.random.normal(ks[3], shape)
    sigma, dsigma, g, n = jnp.float32(2.0), jnp.float32(-0.05), 7.5, 100
    noise = jnp.sqrt(2 * jnp.abs(dsigma) * sigma) * noise_eps
    dx_ind = 2 * dsigma * (vel_u + g * (vel_b - vel_u)) + noise
    k = kappa_and_sde(vel_a, vel_b, dx_ind, sigma, dsigma, g, n, lift=0.0)
    vf = vel_u + g * ((vel_b - vel_u) + k[:, None, None, None] * (vel_a - vel_b))
    dx = 2 * dsigma * vf + noise
    dll = dlogq_sde_sigma_space(jnp.stack([vel_a, vel_b]), dx, sigma, dsigma)
    np.testing.assert_allclose(dll[:, 0], dll[:, 1], rtol=1e-3, atol=1e-3)
