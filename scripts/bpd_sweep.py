"""BPD integrator adequacy sweep (VERDICT r3 #7).

The reference estimates BPD with diffrax's adaptive Dopri5 at
rtol=atol=1e-5 (``cifar/eval_utils.py:30-37``); this repo defaults to a
fixed-grid RK4 (one ``lax.scan``, no rejected steps, TPU-friendly). This
script quantifies what the fixed grid costs: on a trained toy score net
it sweeps RK4 step counts against (a) the in-repo adaptive Dopri5 at the
reference tolerances and (b) an fp64 fine-grid RK4 (n=1600 under
``jax_enable_x64``), then records the table under
``bpd_integrator_sweep`` in BENCH_DETAIL.json (merge, not overwrite).

Pinned conclusion (asserted by
``tests/test_eval.py::test_bpd_rk4_step_count_adequacy``): n_steps=100
agrees with Dopri5-at-1e-5 to <1e-3 bits/dim — the smallest gap in
BASELINE.md's BPD table is 0.08 bits/dim (B 3.52 vs joint 3.44), so the
default grid has ~2 orders of margin.

CPU-only (forces the platform in-process per CLAUDE.md).

  python scripts/bpd_sweep.py [--out BENCH_DETAIL.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[bpd_sweep] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # fp64 reference grid
    import jax.numpy as jnp
    import numpy as np

    from superdiff_tpu.core import VPSchedule, make_dsm_loss
    from superdiff_tpu.eval import bpd
    from superdiff_tpu.models import MLPScoreNet
    from superdiff_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    sched = VPSchedule()
    key = jax.random.PRNGKey(7)
    dim = 2
    model = MLPScoreNet(hidden=(64, 64), out_dim=dim)
    params = model.init(
        key, jnp.zeros((1, 1), jnp.float32), jnp.zeros((1, dim), jnp.float32)
    )["params"]

    def apply_fn(p, t, x, y=None, rng=None):
        return model.apply({"params": p}, t, x)

    loss_fn = make_dsm_loss(apply_fn, sched, t_0=1e-3)
    opt = make_optimizer(lr=2e-3, warmup=50)
    state = init_train_state(key, params, opt, ema_rate=0.99)
    step = make_train_step(opt, loss_fn, donate=False)

    @jax.jit
    def data(k):
        k1, k2 = jax.random.split(k)
        sign = jnp.where(
            jax.random.bernoulli(k1, 0.5, (256, 1)), 1.0, -1.0
        ).astype(jnp.float32)
        return sign * 1.5 + 0.3 * jax.random.normal(k2, (256, dim), jnp.float32)

    log("training toy score net (800 iters) ...")
    for i in range(800):
        state, loss = step(state, {"image": data(jax.random.fold_in(key, i))})
    log(f"final loss {float(loss):.4f}")

    def score_apply(t, x):
        return model.apply({"params": state.params}, t, x.astype(jnp.float32))

    x0 = np.asarray(data(jax.random.PRNGKey(99)), np.float32)
    probe_key = jax.random.PRNGKey(5)  # same key everywhere: one probe

    entry = {
        "protocol": (
            "trained 64x64 MLP score net on bimodal 2-D data; BPD of 256 "
            "held-out points, shared Hutchinson probe; reference = fp64 "
            "fixed-grid RK4 n=1600"
        ),
        "rk4": {},
        "dopri5": {},
    }

    log("fp64 fine-grid reference (RK4 n=1600) ...")
    est = bpd.make_bpd_estimator(score_apply, sched, n_steps=1600, t_0=1e-4)
    ref64, _ = jax.jit(est)(probe_key, jnp.asarray(x0, jnp.float64))
    ref64 = float(ref64)
    entry["reference_fp64_rk4_n1600"] = round(ref64, 6)

    for n in (12, 25, 50, 100, 200, 400):
        est = bpd.make_bpd_estimator(score_apply, sched, n_steps=n, t_0=1e-4)
        t0 = time.perf_counter()
        v, nfe = jax.jit(est)(probe_key, x0)
        v = float(v)
        entry["rk4"][str(n)] = {
            "bpd": round(v, 6),
            "abs_err_vs_fp64": round(abs(v - ref64), 8),
            "nfe": int(nfe),
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        log(f"rk4 n={n}: bpd={v:.6f} err={abs(v - ref64):.2e}")

    for tol in (1e-3, 1e-5):
        est = bpd.make_bpd_estimator(
            score_apply, sched, method="dopri5", rtol=tol, atol=tol, t_0=1e-4
        )
        t0 = time.perf_counter()
        v, nfe = jax.jit(est)(probe_key, x0)
        v = float(v)
        entry["dopri5"][f"{tol:g}"] = {
            "bpd": round(v, 6),
            "abs_err_vs_fp64": round(abs(v - ref64), 8),
            "nfe": int(nfe),
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        log(f"dopri5 tol={tol:g}: bpd={v:.6f} err={abs(v - ref64):.2e} nfe={int(nfe)}")

    err100 = entry["rk4"]["100"]["abs_err_vs_fp64"]
    entry["pinned_default"] = {
        "n_steps": 100,
        "abs_err_vs_fp64": err100,
        "note": (
            "default kept at n_steps=100: error is ~2 orders below the "
            "0.08 bits/dim smallest BASELINE.md BPD gap"
        ),
    }

    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    merged["bpd_integrator_sweep"] = entry
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps({"bpd_integrator_sweep": entry}))


if __name__ == "__main__":
    main()
