"""Same-hardware comparison: this framework's sampler vs the reference's
execution style.

The reference runs its joint sampler as a Python loop over 200 steps with the
N model forwards called serially inside a jitted vector field
(``cifar/eval_utils.py:72-86``, ``cifar/dynamics.py:81-88,120-122``). This
script reproduces that execution shape in JAX on the same chip — jitted
per-step function, serial 2-model forwards, host-side loop — and compares it
against this framework's single-scan, vmapped-ensemble, Pallas-fused design.
The model, math, and precision are identical; only the orchestration differs,
so the ratio isolates the architectural win.

  python scripts/bench_vs_reference_style.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('bench_vs_reference_style')
    from superdiff_tpu.core import SuperposeConfig, VPSchedule, superpose
    from superdiff_tpu.core import ito
    from superdiff_tpu.core.kappa import or_weights
    from superdiff_tpu.models import ScoreUNet, make_stacked_score_fn, stack_params
    from superdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = ScoreUNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 32, 32, 3))

    def init(k):
        return jax.jit(model.init, static_argnames=("train",))(
            {"params": k, "dropout": k}, jnp.ones((1, 1, 1, 1)), x0, None, train=False
        )["params"]

    p1, p2 = init(key), init(jax.random.PRNGKey(1))
    sched = VPSchedule()
    STEPS = 200

    # ---- reference-style: host loop, serial per-model forwards ----------
    def apply_one(p, t, x):
        tb = jnp.broadcast_to(t, (x.shape[0], 1, 1, 1))
        return model.apply({"params": p}, tb, x, None, train=False)

    @jax.jit
    def ref_step(step_key, x, logq, t, dt):
        s1 = apply_one(p1, t, x)  # serial: one model ...
        s2 = apply_one(p2, t, x)  # ... then the other (dynamics.py:120-122)
        sscores = jnp.stack([s1, s2])
        w = or_weights(logq)
        balanced = jnp.einsum("bn,nbhwc->bhwc", w, sscores)
        da, beta, sigma = sched.dlog_alpha_dt(t), sched.beta(t), sched.sigma(t)
        eps = jax.random.normal(step_key, x.shape)
        dx = -dt * (da * x - 2 * beta * balanced) + jnp.sqrt(2 * sigma * beta * dt) * eps
        dlogq = ito.dlogq_sde_vp(sscores, x, dx, t, dt, sched)
        return x + dx, ito.renormalize_logq(logq + dlogq)

    def ref_style_run(k, x):
        b = x.shape[0]
        logq = jnp.zeros((b, 2))
        dt = jnp.float32(1.0 / STEPS)
        t = 1.0
        for i in range(STEPS):  # host-side Python loop (eval_utils.py:61-66)
            x, logq = ref_step(jax.random.fold_in(k, i), x, logq, jnp.float32(t), dt)
            t -= 1.0 / STEPS
        return x

    # ---- this framework: one scan, vmapped ensemble, fused epilogue -----
    stacked = stack_params([p1, p2])
    score_fn = make_stacked_score_fn(
        lambda p, t, xx, y: model.apply({"params": p}, t, xx, y, train=False), stacked
    )
    cfg = SuperposeConfig(n_steps=STEPS, mode="sde", operator="or", fused_kernel=True)
    ours = jax.jit(lambda k, x: superpose(k, x, score_fn, sched, cfg, n_models=2)[0])

    # Two regimes: B=64 is dispatch-bound (per-step host dispatch through the
    # runtime is a large fraction of the ~25 ms step), B=512 compute-bound
    # (the two UNet forwards dominate; orchestration is noise). The one-scan
    # design's win is the former; the latter measures parity of the math.
    results = {}
    for B in (64, 512):
        x1 = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 3))
        r = {}
        for name, fn in [("reference_style", ref_style_run), ("superdiff_tpu", ours)]:
            sync(fn(jax.random.PRNGKey(10), x1))
            sync(fn(jax.random.PRNGKey(11), x1))
            best = float("inf")
            for rep in (12, 13):
                t0 = time.perf_counter()
                sync(fn(jax.random.PRNGKey(rep), x1))
                best = min(best, time.perf_counter() - t0)
            r[name] = {"seconds": round(best, 2), "images_per_sec": round(B / best, 1)}
            print(f"[vs-ref] B={B} {name}: {best:.2f}s ({B/best:.1f} img/s)",
                  file=sys.stderr, flush=True)
        r["speedup"] = round(
            r["reference_style"]["seconds"] / r["superdiff_tpu"]["seconds"], 2
        )
        results[f"batch_{B}"] = r

    results["note"] = (
        "speedup at batch_64 = dispatch-bound regime (scan wins); "
        "batch_512 = compute-bound (same 2 forwards dominate both)"
    )
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
