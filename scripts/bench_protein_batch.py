"""Protein composition batch-throughput sweep (VERDICT r4 #7 follow-through).

The audited roofline (``scripts/protein_flops_audit.py``) puts the
single-trajectory composition at ~1.7 TFLOP/s (3.5% of the fp32-through-MXU
ceiling): at len 100 each scan step is only ~24 GFLOP across many small
pair-tier ops, so the chip idles on op launch/latency, not FLOPs. The
framework's samplers are batched scans end-to-end (``pipelines/protein.
compose(batch=...)`` — one compiled program, trajectories stacked on the
leading axis), so the obvious measured win is batching: this sweep measures
backbones/sec at batch 1/4/8/16 and records the scaling curve.

Run on the chip:  python scripts/bench_protein_batch.py [length]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from superdiff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
NUM_T = 500


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("bench_protein_batch")
    from superdiff_tpu.models.protein import (
        IPAConfig, IPAScoreNetwork, SE3Diffuser, rigid,
    )
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose

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

    def sync(x):
        return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))

    rows = {}
    per_step_gf = 23.84 if N == 100 else None  # protein_flops_audit len100
    for batch in (1, 4, 8, 16):
        f = jax.jit(lambda k, b=batch: compose(
            k, ma, mb, se3, n_res=N, batch=b, cfg=cfg)["rigids"])
        sync(f(jax.random.PRNGKey(0)))
        sync(f(jax.random.PRNGKey(1)))
        t0 = time.perf_counter()
        sync(f(jax.random.PRNGKey(2)))
        dt = time.perf_counter() - t0
        row = {
            "seconds": round(dt, 2),
            "backbones_per_sec": round(batch / dt, 3),
        }
        if per_step_gf:
            row["achieved_tflops"] = round(
                batch * per_step_gf * (NUM_T - 1) / 1e3 / dt, 2)
        rows[f"batch{batch}"] = row
        print(f"batch {batch}: {row}", flush=True)

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    merge_bench_detail({f"protein_compose_batch_sweep_len{N}": {
        "length": N, "steps": NUM_T,
        "models": "proteus_like(6 blk, local-k32) + framediff_like(4 blk)",
        **rows,
    }})
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
