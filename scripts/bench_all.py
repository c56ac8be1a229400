"""Full performance sweep on the attached TPU chip.

Measures every hot path and writes BENCH_DETAIL.json: CIFAR DSM training
throughput, CIFAR 2-model joint sampling (XLA vs Pallas-fused epilogue),
SD-1.x composed inference, and SE(3) composition. All timings use
host-transfer synchronization (required on tunneled runtimes).

  python scripts/bench_all.py [--out BENCH_DETAIL.json]
"""

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[bench_all] {m}", file=sys.stderr, flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).sum())


def bench_cifar_train():
    import jax, jax.numpy as jnp
    from superdiff_tpu.pipelines import cifar as C
    from superdiff_tpu.core import VPSchedule, make_dsm_loss
    from superdiff_tpu.parallel import make_mesh, shard_batch
    from superdiff_tpu.train import init_train_state, make_optimizer, make_train_step
    import numpy as np

    cfg = C.CifarConfig()
    model = cfg.model()
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": key, "dropout": key}, jnp.ones((1, 1, 1, 1)), x, None, train=True)["params"]
    loss_fn = make_dsm_loss(C._apply_fn(model), VPSchedule())
    opt = make_optimizer()
    state = init_train_state(key, params, opt)
    mesh = make_mesh(model=1)
    step = make_train_step(opt, loss_fn, mesh=mesh)
    batch = shard_batch({"image": np.random.randn(cfg.batch_size, 32, 32, 3).astype(np.float32)}, mesh)
    # two synced warmups: on tunneled runtimes the first sync can return
    # before the first real execution lands (see verify skill notes)
    for _ in range(2):
        state, loss = step(state, batch)
        sync(loss)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch)
    sync(loss)
    dt = (time.perf_counter() - t0) / n
    return {"steps_per_sec": round(1 / dt, 2), "images_per_sec": round(cfg.batch_size / dt, 1),
            "batch_size": cfg.batch_size, "model": "ScoreUNet nf=128 bf16"}


def bench_cifar_joint(fused):
    import jax, jax.numpy as jnp
    from superdiff_tpu.core import VPSchedule, SuperposeConfig, superpose
    from superdiff_tpu.models import ScoreUNet, make_stacked_score_fn, stack_params

    model = ScoreUNet(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 32, 32, 3))
    init = lambda k: jax.jit(model.init, static_argnames=("train",))(
        {"params": k, "dropout": k}, jnp.ones((1, 1, 1, 1)), x0, None, train=False)["params"]
    stacked = stack_params([init(key), init(jax.random.PRNGKey(1))])
    score_fn = make_stacked_score_fn(
        lambda p, t, xx, y: model.apply({"params": p}, t, xx, y, train=False), stacked)
    cfg = SuperposeConfig(n_steps=200, mode="sde", operator="or", fused_kernel=fused)
    B = 512
    x1 = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 3))
    f = jax.jit(lambda k, x: superpose(k, x, score_fn, VPSchedule(), cfg, n_models=2))
    sync(f(key, x1)[0])
    t0 = time.perf_counter()
    sync(f(jax.random.fold_in(key, 1), x1)[0])
    dt = time.perf_counter() - t0
    return {"images_per_sec": round(B / dt, 1), "batch": B, "steps": 200, "fused": fused}


def bench_sd():
    import jax, jax.numpy as jnp
    from superdiff_tpu.pipelines import sd as sdp

    cfg = sdp.SDPipelineConfig(num_inference_steps=50, height=512, width=512)
    mod = sdp.build_sd_modules(jax.random.PRNGKey(0), height=512, width=512)
    mod.unet_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, mod.unet_params)
    B = 4
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 768))
    run = sdp.make_sampler(mod, "or", cfg)
    sync(run(jax.random.PRNGKey(2), ctx, ctx, ctx)[0])
    sync(run(jax.random.PRNGKey(3), ctx, ctx, ctx)[0])
    t0 = time.perf_counter()
    sync(run(jax.random.PRNGKey(4), ctx, ctx, ctx)[0])
    dt = time.perf_counter() - t0
    return {"images_per_sec_chip": round(B / dt, 4), "batch": B, "steps": 50,
            "method": "or (3 conditionings/step, one batched fwd)"}


def bench_protein():
    import jax, jax.numpy as jnp
    from superdiff_tpu.models.protein import IPAConfig, IPAScoreNetwork, SE3Diffuser, rigid
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose

    se3 = SE3Diffuser.default()
    n = 100
    feats0 = {
        "rigids_t": rigid.rigid_identity((1, n)),
        "res_mask": jnp.ones((1, n)), "fixed_mask": jnp.zeros((1, n)),
        "t": jnp.ones((1,)), "seq_idx": jnp.arange(n)[None],
        "sc_ca_t": jnp.zeros((1, n, 3)),
    }
    net_a = IPAScoreNetwork(IPAConfig.proteus_like(), se3)
    net_b = IPAScoreNetwork(IPAConfig.framediff_like(), se3)
    pa = net_a.init(jax.random.PRNGKey(1), feats0)["params"]
    pb = net_b.init(jax.random.PRNGKey(2), feats0)["params"]
    ma = lambda feats, t: net_a.apply({"params": pa}, feats)
    mb = lambda feats, t: net_b.apply({"params": pb}, feats)
    cfg = CompositionConfig(num_t=500, kappa_operator="OR", stochastic=True)
    f = jax.jit(lambda k: compose(k, ma, mb, se3, n_res=n, cfg=cfg)["rigids"])
    # TWO synced warmups (CLAUDE.md timing gotcha): the single-warmup r2
    # measurement recorded 7.0 s/backbone - that number was compile/warmup
    # absorption; the steady state is ~1-2 s (trace_protein.py r5)
    sync(f(jax.random.PRNGKey(0)))
    sync(f(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    sync(f(jax.random.PRNGKey(2)))
    dt = time.perf_counter() - t0
    return {"seconds_per_backbone": round(dt, 2), "length": n, "steps": 500,
            "models": "proteus_like(6 blk, local-k32) + framediff_like(4 blk)"}


def bench_flops_audit():
    """Independent UNet FLOP audit (scripts/flops_audit.py) in a CPU-forced
    subprocess — the MFU denominator used by STATUS/BENCH numbers."""
    import json as _json
    import os as _os
    import subprocess as _sp

    env = dict(_os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    out = _sp.run(
        [sys.executable, _os.path.join(_os.path.dirname(__file__), "flops_audit.py")],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    return _json.loads(out.stdout.strip().splitlines()[-1])


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('bench_all')
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    args = ap.parse_args()
    from superdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    results = {}
    for name, fn in [
        ("cifar_train", bench_cifar_train),
        ("cifar_joint_xla", lambda: bench_cifar_joint(False)),
        ("cifar_joint_pallas", lambda: bench_cifar_joint(True)),
        ("sd_compose_512px", bench_sd),
        ("protein_compose", bench_protein),
        ("sd_unet_flops_audit", bench_flops_audit),
    ]:
        log(f"running {name} ...")
        try:
            t0 = time.perf_counter()
            results[name] = fn()
            log(f"{name}: {results[name]} ({time.perf_counter()-t0:.0f}s incl compile)")
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{name} FAILED: {e}")
    # merge-don't-overwrite: BENCH_DETAIL.json also carries entries owned
    # by other scripts (trace_unet, bpd_sweep, kernel sweeps). Resolve a
    # bare filename against the repo root so runs from another cwd update
    # the same artifact.
    from superdiff_tpu.utils.bench_io import merge_bench_detail

    out = args.out
    if not os.path.isabs(out) and os.sep not in out:
        out = os.path.join(os.path.dirname(__file__), "..", out)
    merge_bench_detail(results, path=out)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
