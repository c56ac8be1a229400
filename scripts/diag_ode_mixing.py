"""Mid-scale CPU diagnosis of the joint-ODE OR mixing path (VERDICT r4 #1).

QUALITY.json r4 showed joint_or_ode FID 81.7 vs model_B_sde 49.4 /
joint_or_sde 8.1, where the reference's joint-ODE lands *between* the
singles (evals.ipynb cells 8/10: 4.41 vs 5.30/4.69). Two hypotheses:

  (a) the ODE mixing path (`core/superpose.ode_step`: hard-max OR over
      Hutchinson-noised running lls, single shared probe) has a real
      quality bug that only appears at scale;
  (b) ODE sampling in the stand-in protocol is uniformly bad (singles
      included) and the anomaly is protocol-level, not a mixing bug.

This script separates them with an analytic rig where every quantity has
a closed form. Crucially, the existing 2-D test
(tests/test_ito.py::test_ode_logq_tracks_analytic_density_ratio) uses
*isotropic* Gaussians — and a Rademacher-probe Hutchinson estimate is
EXACT (zero variance) for any diagonal score Jacobian, so that test is
structurally blind to divergence-noise failure modes. Here each model is
a full-covariance Gaussian (random rotation x anisotropic spectrum), so
the score Jacobian ``-sigma (a^2 Sigma + sigma^2 I)^-1`` has off-diagonal
mass and the probe estimate carries real per-step variance at D=512,
while the exact divergence ``tr(J)`` stays closed-form.

Variants compared (same trajectories counterfactual where possible):
  single_{a,b}_{sde,ode}   — per-model baselines
  joint_or_sde             — the r4-good control
  joint_or_ode             — the accused path (1 shared Rademacher probe)
  joint_or_ode_exactdiv    — same mixing, analytic divergence (isolates
                             Hutchinson noise from the mixing math)
  joint_or_ode_kprobe      — probe-averaged divergence (k=8)

Metrics per variant: endpoint mode split, mean min-Mahalanobis distance
to the two component Gaussians (calibrated: E[d^2]=D for a true draw),
Gaussian-W2^2 of each mode's sample pool against its target component,
and |running dll - analytic dll| tracking error.

  JAX_PLATFORMS=cpu python scripts/diag_ode_mixing.py [--dim 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp
import numpy as np

from superdiff_tpu.core import VPSchedule
from superdiff_tpu.core import ito
from superdiff_tpu.core.kappa import or_weights

SCHED = VPSchedule()


def make_models(key, dim, sep=2.0):
    """Two full-covariance Gaussian 'models' with analytic everything.

    mu_a/mu_b separated by `sep` in units of mean component std; spectra
    log-uniform in [0.3, 1.2] with distinct random rotations, so the two
    score Jacobians genuinely differ (off-diagonal in any shared basis).
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d = jax.random.normal(k1, (dim,))
    d = d / jnp.linalg.norm(d)
    mu_a = 0.5 * sep * d
    mu_b = -0.5 * sep * d

    qa, _ = jnp.linalg.qr(jax.random.normal(k2, (dim, dim)))
    sa = jnp.exp(jax.random.uniform(k3, (dim,), minval=jnp.log(0.3),
                                    maxval=jnp.log(1.2)))
    qb, _ = jnp.linalg.qr(jax.random.normal(k4, (dim, dim)))
    sb = jnp.exp(jax.random.uniform(k5, (dim,), minval=jnp.log(0.3),
                                    maxval=jnp.log(1.2)))
    return (mu_a, qa, sa**2), (mu_b, qb, sb**2)


def marginal_inv_cov(model, t):
    """(a^2 Sigma + sigma^2 I)^-1 via the model's eigenbasis; returns
    (Q, 1/lam) with lam the marginal eigenvalues."""
    mu, q, s2 = model
    a, sig = SCHED.alpha(t), SCHED.sigma(t)
    lam = a**2 * s2 + sig**2
    return q, 1.0 / lam


def sscore(model, t, x):
    """Sigma-scaled score: -sigma * (a^2 Sigma + sigma^2 I)^-1 (x - a mu)."""
    mu, q, s2 = model
    a, sig = SCHED.alpha(t), SCHED.sigma(t)
    qm, inv_lam = marginal_inv_cov(model, t)
    y = (x - a * mu) @ qm  # rotate into eigenbasis
    return -sig * ((y * inv_lam) @ qm.T)


def sscore_jvp_exact(model, t, v):
    """J_s v for the linear score map (exact JVP)."""
    _, q, s2 = model
    sig = SCHED.sigma(t)
    qm, inv_lam = marginal_inv_cov(model, t)
    return -sig * (((v @ qm) * inv_lam) @ qm.T)


def exact_hutch(model, t, dim):
    """tr(J_s) — what Hutchinson estimates: sum(probe * J probe)."""
    sig = SCHED.sigma(t)
    _, inv_lam = marginal_inv_cov(model, t)
    return -sig * jnp.sum(inv_lam)


def analytic_logq_t(model, t, x):
    mu, q, s2 = model
    a = SCHED.alpha(t)
    qm, inv_lam = marginal_inv_cov(model, t)
    y = (x - a * mu) @ qm
    return (-0.5 * jnp.sum(y**2 * inv_lam, -1)
            + 0.5 * jnp.sum(jnp.log(inv_lam)))


def run(models, key, batch, dim, n_steps, mode, operator="or",
        div_mode="hutch", k_probes=1, single=None):
    """One reverse trajectory batch; mirrors core/superpose exactly but with
    injectable divergence estimation (the diagnosis lever)."""
    ma, mb = models
    act = [ma, mb] if single is None else [models[single]]
    n_models = len(act)
    dt = jnp.float32(1.0 / n_steps)
    x = jax.random.normal(jax.random.fold_in(key, 0), (batch, dim))
    logq = jnp.zeros((batch, n_models), jnp.float32)

    def score_all(t, xx):
        return jnp.stack([sscore(m, t, xx) for m in act])

    def body(carry, i):
        x, logq = carry
        t = 1.0 - i.astype(jnp.float32) * dt
        kstep = jax.random.fold_in(key, i + 1)
        sscores = score_all(t, x)
        da, beta, sig = SCHED.dlog_alpha_dt(t), SCHED.beta(t), SCHED.sigma(t)
        if operator == "or":
            w = or_weights(logq, 1e6)
        else:
            w = jnp.full_like(logq, 1.0 / n_models)
        wmix = jnp.moveaxis(w, -1, 0)[..., None]
        if mode == "sde":
            eps = jax.random.normal(kstep, x.shape)
            balanced = jnp.sum(wmix * sscores, 0)
            dx = (-dt * (da * x - 2.0 * beta * balanced)
                  + jnp.sqrt(2.0 * sig * beta * dt) * eps)
            dlogq = ito.dlogq_sde_vp(sscores, x, dx, t, dt, SCHED)
        else:
            vfs = da * x[None] - beta * sscores
            dx = -dt * jnp.sum(wmix * vfs, 0)
            if div_mode == "exact":
                divs = jnp.stack(
                    [jnp.broadcast_to(exact_hutch(m, t, dim), (batch,))
                     for m in act])
            else:
                acc = jnp.zeros((n_models, batch))
                for p in range(k_probes):
                    probe = ito.rademacher(
                        jax.random.fold_in(kstep, p), x.shape)
                    tang = jnp.stack(
                        [sscore_jvp_exact(m, t, probe) for m in act])
                    acc = acc + jnp.sum(tang * probe[None], -1)
                divs = acc / k_probes
            dlogq = ito.dlogq_ode_vp(sscores, divs, x, dx, t, dt, SCHED)
        logq = ito.renormalize_logq(logq + dlogq)
        return (x + dx, logq), None

    (x, logq), _ = jax.lax.scan(body, (x, logq), jnp.arange(n_steps))
    return x, logq


def gauss_w2sq(xs, mu, q, s2):
    """Gaussian W2^2 between the empirical pool and N(mu, Q diag(s2) Q^T),
    both treated as Gaussians (exact for the target; moment-matched for
    the pool) — computed in the target's eigenbasis."""
    y = (xs - mu[None]) @ q
    m = jnp.mean(y, 0)
    c = jnp.cov(y.T) if y.shape[0] > 1 else jnp.zeros((y.shape[1],) * 2)
    # W2^2 = |m|^2 + tr(C) + tr(S) - 2 tr((S^1/2 C S^1/2)^1/2); S diagonal
    s = jnp.diag(s2)
    cs = jnp.sqrt(s2)[:, None] * c * jnp.sqrt(s2)[None, :]
    ev = jnp.linalg.eigvalsh((cs + cs.T) / 2)
    tr_cross = jnp.sum(jnp.sqrt(jnp.clip(ev, 0)))
    return float(jnp.sum(m**2) + jnp.trace(c) + jnp.sum(s2) - 2 * tr_cross)


def evaluate(name, xs, logq, models, results):
    ma, mb = models
    mu_a, qa, s2a = ma
    mu_b, qb, s2b = mb
    ya = (xs - mu_a[None]) @ qa
    d2a = np.asarray(jnp.sum(ya**2 / s2a, -1))
    yb = (xs - mu_b[None]) @ qb
    d2b = np.asarray(jnp.sum(yb**2 / s2b, -1))
    to_a = d2a < d2b
    dim = xs.shape[1]
    # calibrated: a true component draw has E[d2]=D, sd(d2)~sqrt(2D)
    min_d2 = np.minimum(d2a, d2b)
    row = {
        "frac_a": round(float(np.mean(to_a)), 3),
        "mean_min_d2_over_D": round(float(np.mean(min_d2) / dim), 3),
        "p95_min_d2_over_D": round(float(np.quantile(min_d2, 0.95) / dim), 3),
    }
    if np.sum(to_a) > dim // 4:
        row["w2sq_mode_a"] = round(gauss_w2sq(xs[to_a], mu_a, qa, s2a), 2)
    if np.sum(~to_a) > dim // 4:
        row["w2sq_mode_b"] = round(gauss_w2sq(xs[~to_a], mu_b, qb, s2b), 2)
    if logq is not None and logq.shape[1] == 2:
        est = np.asarray(logq[:, 0] - logq[:, 1])
        ref = np.asarray(analytic_logq_t(ma, 1e-10 + 1.0 / 200, jnp.asarray(xs))
                         - analytic_logq_t(mb, 1e-10 + 1.0 / 200, jnp.asarray(xs)))
        row["dll_sign_agree"] = round(float(np.mean(np.sign(est) == np.sign(ref))), 3)
        rel = np.abs(est - ref) / np.maximum(np.abs(ref), 1.0)
        row["dll_median_rel_err"] = round(float(np.median(rel)), 3)
    results[name] = row
    print(f"{name:28s} {row}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--sep", type=float, default=2.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    models = make_models(jax.random.PRNGKey(42), args.dim, args.sep)
    key = jax.random.PRNGKey(7)
    results = {}

    variants = [
        ("single_a_sde", dict(mode="sde", single=0)),
        ("single_b_sde", dict(mode="sde", single=1)),
        ("single_a_ode", dict(mode="ode", div_mode="exact", single=0)),
        ("single_b_ode", dict(mode="ode", div_mode="exact", single=1)),
        ("joint_or_sde", dict(mode="sde")),
        ("joint_or_ode_hutch1", dict(mode="ode", div_mode="hutch", k_probes=1)),
        ("joint_or_ode_exactdiv", dict(mode="ode", div_mode="exact")),
        ("joint_or_ode_hutch8", dict(mode="ode", div_mode="hutch", k_probes=8)),
    ]
    for name, kw in variants:
        xs, logq = jax.jit(
            lambda k, kw=kw: run(models, k, args.batch, args.dim,
                                 args.steps, **kw)
        )(key)
        evaluate(name, np.asarray(xs),
                 np.asarray(logq) if kw.get("single") is None else None,
                 models, results)

    out = {
        "dim": args.dim, "batch": args.batch, "steps": args.steps,
        "sep": args.sep, "results": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
