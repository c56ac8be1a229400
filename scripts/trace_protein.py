"""Perfetto trace of the SE(3) composition step (VERDICT r4 #7).

Captures one profiled execution of ``pipelines/protein.compose`` at the
benchmarked shape (len 100, OR, stochastic — the BENCH_DETAIL
``protein_compose`` configuration) with a reduced step count (the scan body
is identical per step), and reports per-op / per-category device times
through the same taxonomy as ``scripts/trace_unet.py`` — giving the protein
path the SD path's measurement discipline: audited FLOP denominator
(``scripts/protein_flops_audit.py``) + measured category split + roofline.

Run on the chip:  python scripts/trace_protein.py [length] [steps]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from superdiff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
NUM_T = int(sys.argv[2]) if len(sys.argv) > 2 else 51  # 50 scan steps
LOGDIR = "/tmp/trace_protein"


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("trace_protein")
    from superdiff_tpu.models.protein import (
        IPAConfig, IPAScoreNetwork, SE3Diffuser, rigid,
    )
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose
    from superdiff_tpu.utils import traceparse

    se3 = SE3Diffuser.default()
    feats0 = {
        "rigids_t": rigid.rigid_identity((1, N)),
        "res_mask": jnp.ones((1, N)), "fixed_mask": jnp.zeros((1, N)),
        "t": jnp.ones((1,)), "seq_idx": jnp.arange(N)[None],
        "sc_ca_t": jnp.zeros((1, N, 3)),
    }
    net_a = IPAScoreNetwork(IPAConfig.proteus_like(), se3)
    net_b = IPAScoreNetwork(IPAConfig.framediff_like(), se3)
    pa = net_a.init(jax.random.PRNGKey(1), feats0)["params"]
    pb = net_b.init(jax.random.PRNGKey(2), feats0)["params"]
    ma = lambda feats, t: net_a.apply({"params": pa}, feats)
    mb = lambda feats, t: net_b.apply({"params": pb}, feats)
    cfg = CompositionConfig(num_t=NUM_T, kappa_operator="OR", stochastic=True)
    f = jax.jit(lambda k: compose(k, ma, mb, se3, n_res=N, cfg=cfg)["rigids"])

    def sync(x):
        return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))

    sync(f(jax.random.PRNGKey(0)))
    sync(f(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    s = sync(f(jax.random.PRNGKey(2)))
    steps = NUM_T - 1
    dt_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"composition: {dt_ms:.2f} ms/step (len {N}, sink={s:.3e})")

    shutil.rmtree(LOGDIR, ignore_errors=True)
    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    sync(f(jax.random.PRNGKey(3)))
    jax.profiler.stop_trace()

    per_op = traceparse.load_device_ops(LOGDIR)
    entry = traceparse.report(per_op, steps)
    entry.update({
        "wall_ms_per_step": round(dt_ms, 2),
        "length": N,
        "steps_traced": steps,
        "models": "proteus_like(6 blk, local-k32) + framediff_like(4 blk)",
        "projected_seconds_per_backbone_500steps": round(dt_ms * 499 / 1e3, 2),
    })
    from superdiff_tpu.utils.bench_io import merge_bench_detail

    merge_bench_detail({f"protein_compose_trace_len{N}": entry})
    print(f"BENCH_DETAIL entry written: protein_compose_trace_len{N}")


if __name__ == "__main__":
    main()
