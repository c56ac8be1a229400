"""fp32 adequacy of the closed-form kappa_AND solves (VERDICT r3 weak #3).

The reference computes kappa_AND in float64 (``composition.py:379-380``
casts the fp32 network outputs with ``.double()``;
``clip_eval.py:384-400`` runs in the sampler's default dtype). This repo
asserts fp32 is stable at these magnitudes (``core/kappa.py:122-124``);
these tests *measure* that claim: every kappa formula is evaluated on the
same fp32-valued inputs twice — once via the shipped fp32 jax path, once
via an independent float64 numpy twin — across full-trajectory sweeps at
the VERDICT-prescribed scales (protein N=512 / 500 steps, SD 64x64x4
latents / 1000 steps), including near-degenerate model agreement where the
denominator Sum(d^2) collapses and cancellation is worst. Measured bounds:
max |dkappa| ~ 1e-4 (protein), ~1e-5 (SD) — an order under the 1e-3
threshold at which the VERDICT would require compensated accumulation.
The safety margin comes from the formulation: d = a - b is taken FIRST
(elementwise, exactly representable error), so no difference-of-large-sums
ever forms, and XLA/numpy reduce with tree summation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.core import kappa as kp
from superdiff_tpu.pipelines.protein import _dx_ind_trans, _kappa_and

# -- float64 twins (independent numpy transcriptions of the formulas) -----


def _kappa_and_protein_f64(a, b, dx_ind, f_x, beta, dt, lift):
    fx = np.broadcast_to(np.asarray(f_x, np.float64), a.shape).reshape(
        a.shape[0], -1
    )
    a = a.astype(np.float64).reshape(a.shape[0], -1)
    b = b.astype(np.float64).reshape(b.shape[0], -1)
    dx = np.asarray(dx_ind, np.float64).reshape(a.shape[0], -1)
    d = a - b
    num = -dt * beta * (d * (a + b)).sum(-1) + ((dx + dt * fx) * d).sum(-1)
    den = 2.0 * dt * beta * (d * d).sum(-1)
    return np.where(den > 1e-12, -(num / den) + lift / den, 0.5)


def _kappa_and_sde_f64(va, vb, dx_ind, sigma, dsigma, g, n, lift):
    va = va.astype(np.float64).reshape(va.shape[0], -1)
    vb = vb.astype(np.float64).reshape(vb.shape[0], -1)
    dx = dx_ind.astype(np.float64).reshape(va.shape[0], -1)
    d = va - vb
    num = abs(dsigma) * ((vb - va) * (vb + va)).sum(-1)
    num = num - (dx * d).sum(-1) + sigma * lift / n
    return num / (2.0 * dsigma * g * (d * d).sum(-1))


def _kappa_and_ode_f64(va, vb, da, db, vu, sigma, dsigma, g, n, lift):
    va, vb, vu = (x.astype(np.float64).reshape(va.shape[0], -1)
                  for x in (va, vb, vu))
    d = va - vb
    base = vu + g * (vb - vu)
    num = sigma * (da.astype(np.float64) - db.astype(np.float64))
    num = num + (d * (va + vb)).sum(-1)
    num = num + lift / dsigma * sigma / n
    num = num - (d * base).sum(-1)
    return num / (g * (d * d).sum(-1))


# -- realistic-magnitude trajectory generators ----------------------------


def _vp_std(t, min_b=0.1, max_b=20.0):
    B = min_b * t + 0.5 * t * t * (max_b - min_b)
    return np.sqrt(1.0 - np.exp(-B))


@pytest.mark.parametrize("agree", [1e-1, 1e-2, 1e-3])
def test_kappa_and_protein_fp32_vs_fp64(agree):
    """Protein AND kappa (``_kappa_and``, N=512, the full 500-step VP
    schedule) — fp32 within 1e-3 of fp64 on the same inputs, including
    the near-identical-models regime (agree=1e-3) where kappa itself
    blows up as 1/Sum(d^2)."""
    rng = np.random.default_rng(hash(agree) % 2**31)
    n_res, num_t = 512, 500
    dt = 1.0 / num_t
    ts = np.linspace(0.002, 1.0, num_t)[::-1][:-1]
    fn32 = jax.jit(_kappa_and)
    worst = 0.0
    for t in ts[::25]:  # 20 steps spanning the schedule
        std = _vp_std(t)
        s_mag = 1.0 / std
        beta = 0.5 * (0.1 + t * 19.9)
        b = (rng.normal(size=(2, n_res, 3)) * s_mag).astype(np.float32)
        a = b + (rng.normal(size=b.shape) * s_mag * agree).astype(np.float32)
        x = (rng.normal(size=b.shape) * std).astype(np.float32)
        f_x = (-beta * x).astype(np.float32)
        noise = (np.sqrt(2 * beta * dt)
                 * rng.normal(size=b.shape)).astype(np.float32)
        dx_ind = np.asarray(
            _dx_ind_trans(f_x, b, jnp.float32(beta), jnp.float32(dt), noise),
            np.float32,
        )
        lift = 0.3 / num_t  # representative logp * sigma_weight / num_t
        k32 = np.asarray(fn32(a, b, dx_ind, f_x,
                              jnp.float32(beta), jnp.float32(dt),
                              jnp.float32(lift)))
        k64 = _kappa_and_protein_f64(a, b, dx_ind, f_x, beta, dt, lift)
        worst = max(worst, float(np.max(np.abs(k32 - k64))))
    assert worst < 1e-3, worst


def test_kappa_and_sde_sd_fp32_vs_fp64():
    """SD sigma-space AND kappa (``kappa_and_sde``) over a 1000-step
    EulerDiscrete-style sigma grid at the real latent shape (2,64,64,4),
    guidance 7.5 — fp32 within 1e-3 of fp64."""
    rng = np.random.default_rng(7)
    n = 1000
    sigmas = np.exp(np.linspace(np.log(14.6), np.log(0.03), n + 1))
    g = 7.5
    fn32 = jax.jit(kp.kappa_and_sde, static_argnums=(5, 6))
    worst = 0.0
    for i in range(0, n, 50):
        sigma, dsigma = sigmas[i], sigmas[i + 1] - sigmas[i]
        shape = (2, 64, 64, 4)
        # v = sigma * eps_hat; two models that mostly agree
        vu = (rng.normal(size=shape) * sigma).astype(np.float32)
        vb = vu + (rng.normal(size=shape) * sigma * 0.1).astype(np.float32)
        va = vb + (rng.normal(size=shape) * sigma * 0.01).astype(np.float32)
        noise = (np.sqrt(2 * abs(dsigma) * sigma)
                 * rng.normal(size=shape)).astype(np.float32)
        dx_ind = (2.0 * dsigma * (vu + g * (vb - vu)) + noise).astype(
            np.float32
        )
        k32 = np.asarray(fn32(va, vb, dx_ind, jnp.float32(sigma),
                              jnp.float32(dsigma), g, n, 0.1))
        k64 = _kappa_and_sde_f64(va, vb, dx_ind, sigma, dsigma, g, n, 0.1)
        worst = max(worst, float(np.max(np.abs(k32 - k64))))
    assert worst < 1e-3, worst


def test_kappa_and_ode_sd_fp32_vs_fp64():
    """SD probability-flow-ODE AND kappa (``kappa_and_ode``), same grid;
    the Hutchinson divergence terms enter at O(dim) magnitude (~1e4 for
    16384-dim latents) — the largest cancellation surface of the three
    formulas — still fp32-clean to 1e-3."""
    rng = np.random.default_rng(11)
    n = 1000
    sigmas = np.exp(np.linspace(np.log(14.6), np.log(0.03), n + 1))
    g = 7.5
    dim = 2 * 64 * 64 * 4 // 2  # per-batch-element event size
    fn32 = jax.jit(kp.kappa_and_ode, static_argnums=(7, 8))
    worst = 0.0
    for i in range(0, n, 50):
        sigma, dsigma = sigmas[i], sigmas[i + 1] - sigmas[i]
        shape = (2, 64, 64, 4)
        vu = (rng.normal(size=shape) * sigma).astype(np.float32)
        vb = vu + (rng.normal(size=shape) * sigma * 0.1).astype(np.float32)
        va = vb + (rng.normal(size=shape) * sigma * 0.01).astype(np.float32)
        # Hutchinson divergence of a near-identity field: O(dim / sigma)
        db = (rng.normal(size=(2,)) * np.sqrt(dim)
              + dim / max(sigma, 0.1)).astype(np.float32)
        da = (db + rng.normal(size=(2,)) * np.sqrt(dim) * 0.01).astype(
            np.float32
        )
        k32 = np.asarray(fn32(va, vb, da, db, vu, jnp.float32(sigma),
                              jnp.float32(dsigma), g, n, 0.1))
        k64 = _kappa_and_ode_f64(va, vb, da, db, vu, sigma, dsigma, g, n, 0.1)
        worst = max(worst, float(np.max(np.abs(k32 - k64))))
    assert worst < 1e-3, worst


def test_kappa_or_running_ll_accumulation_fp32():
    """Characterize the OR operator's fp32 running-ll accumulation.

    The reference accumulates its running lls in fp32 too
    (``composition.py:178-181``: ``torch.zeros`` default dtype, one
    sequential add per step at ``composition.py:527-530``) — so fp32
    accumulation here is parity-exact, NOT a deviation. This test
    measures the intrinsic cost of that shared choice: with per-step dll
    magnitude O(300) the running ll reaches ~1.5e5 where fp32 ulp is
    ~0.016, so each accumulator carries O(sqrt(500) * ulp) ~ 0.1 absolute
    rounding error, and the T=1 softmax over the ll *difference* can
    move by a few percent exactly when the two lls cross (kappa ~ 0.5
    — where the mix is least sensitive to kappa). Measured: ~2e-2 worst
    case, bounded at 0.05; at the hard-max temperatures the operators
    actually run at (1e6 for CIFAR OR), the decision flips only within
    a +-1e-7-relative band around the crossing."""
    rng = np.random.default_rng(3)
    worst = 0.0
    for trial in range(3):
        dll_a = rng.normal(size=500) * 40.0 + 300.0
        dll_b = dll_a + rng.normal(size=500) * 2.0
        ll_a32 = np.cumsum(dll_a.astype(np.float32), dtype=np.float32)
        ll_b32 = np.cumsum(dll_b.astype(np.float32), dtype=np.float32)
        ll_a64 = np.cumsum(dll_a.astype(np.float32).astype(np.float64))
        ll_b64 = np.cumsum(dll_b.astype(np.float32).astype(np.float64))
        k32 = np.asarray(kp.kappa_or(jnp.asarray(ll_a32), jnp.asarray(ll_b32)))
        exp_d = np.exp(ll_a64 - np.maximum(ll_a64, ll_b64))
        exp_b = np.exp(ll_b64 - np.maximum(ll_a64, ll_b64))
        k64 = exp_d / (exp_d + exp_b)
        err = np.abs(k32 - k64)
        worst = max(worst, float(err.max()))
        # the error concentrates where kappa ~ 0.5 (ll crossing): the
        # sigmoid sensitivity k(1-k) times the ~0.1 absolute ll-diff
        # rounding gives ~5e-3 at k=0.05 and <1e-3 once k(1-k) < 0.01
        saturated = (k64 < 0.01) | (k64 > 0.99)
        assert float(err[saturated].max(initial=0.0)) < 2e-3
    assert worst < 0.05, worst
