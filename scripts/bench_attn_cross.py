"""A/B the cross-attention (kv=77) routing per UNet tier on the chip.

The trace (BENCH_DETAIL sd_unet_fwd_b24_fused_flash_eo_subpixel_dedup)
shows each L0 ``attn2`` Pallas call at ~1.6 ms — ~10x its HBM bound (the
q/o streams are 2x63 MB; the QK^T/PV FLOPs at kv=77 are negligible). The
suspected cost: ``_kernel_mh_nat`` slices the packed (bq, H*D) tile per
head at 40-lane granularity, which Mosaic lowers to cross-lane shuffles
on every head. Variants per tier:

  nat      round-3 production routing: packed (B, L, H*D) views,
           per-head static lane slices (_kernel_mh_nat)
  xpk      block-diagonal packed kernel (_kernel_cross_packed): one
           128-padded kv block per head embedded block-diagonally into
           (C, H*128) / (H*128, C) operands, so scores/PV are single
           matmuls and every per-head op is a 128-aligned lane slice —
           zero shuffles; q/o stay packed
  einsum   XLA lowering (materializes logits through HBM — at kv=77 the
           padded logits tensor is small enough that XLA's fusions win)
  noattn   projections + out-proj only (identity attention) — the fixed
           cost floor of the pattern

Pattern: q-proj from x + packed kv-proj from context + attention +
out-proj inside a 10-iter scan, B=24, ctx 77x768, at the three SD
cross-attention tiers (L, C) = (4096, 320), (1024, 640), (256, 1280).

Run on the real chip:  python scripts/bench_attn_cross.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B, H = 24, 8
LK, CTX = 77, 768
K = 10
TIERS = [(4096, 320), (1024, 640), (256, 1280)]


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args))
    sync(f(*args))
    t0 = time.perf_counter()
    s = sync(f(*args))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:24s} {dt:7.2f} ms/iter  (sink {s:.3e})", flush=True)
    return dt


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("bench_attn_cross")
    import superdiff_tpu.ops.pallas.flash_attention as fa

    key = jax.random.PRNGKey(0)
    results = {}
    for L, C in TIERS:
        D = C // H
        x = jax.random.normal(key, (B, L, C), jnp.bfloat16)
        ctx = jax.random.normal(key, (B, LK, CTX), jnp.bfloat16)
        wq = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.05
        wkv = jax.random.normal(key, (CTX, 2 * C), jnp.bfloat16) * 0.02
        wo = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.05

        def scan(body):
            def fn(x):
                def step(h, _):
                    return body(h).astype(jnp.bfloat16), ()

                out, _ = jax.lax.scan(step, x, None, length=K)
                return out

            return fn

        def qkv(x):
            q = (x @ wq).reshape(B, L, H, D)
            kv = ctx @ wkv
            k, v = jnp.split(kv, 2, axis=-1)
            return q, k.reshape(B, LK, H, D), v.reshape(B, LK, H, D)

        def attn_kernel(x, impl):
            q, k, v = qkv(x)
            if impl == "xpk":
                # call the kernel directly: the production dispatch gates
                # xpk on lq >= 4*H*128 and this sweep is the evidence for
                # (or against) relaxing that gate per tier
                o = fa._cross_packed(
                    q, k, v, float(D**-0.5 * fa._LOG2_E),
                    fa._CROSS_BLOCK_Q, False)
            else:
                prev = fa._CROSS_IMPL
                fa._CROSS_IMPL = impl
                try:
                    o = fa.flash_mha(q, k, v)
                finally:
                    fa._CROSS_IMPL = prev
            return o.reshape(B, L, C) @ wo

        def attn_einsum(x):
            q, k, v = qkv(x)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            attn = jax.nn.softmax(
                logits * (D**-0.5), axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            return o.reshape(B, L, C) @ wo

        def attn_noattn(x):
            q = x @ wq
            kv = ctx @ wkv
            k, v = jnp.split(kv, 2, axis=-1)
            return (q + jnp.sum(k + v) * 0) @ wo

        variants = [
            ("nat", lambda x: attn_kernel(x, "nat")),
            ("xpk", lambda x: attn_kernel(x, "xpk")),
            ("einsum", attn_einsum),
            ("noattn", attn_noattn),
        ]
        ref = None
        tier = {}
        for name, body in variants:
            dt = timeit(f"L{L}/C{C} {name}", scan(body), x)
            tier[name] = round(dt, 2)
            if name != "noattn":
                out = jax.jit(scan(body))(x)
                if ref is None:
                    ref = out
                else:
                    err = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) - ref.astype(jnp.float32))))
                    print(f"    max |diff| vs nat: {err:.3e}", flush=True)
        results[f"L{L}_C{C}"] = tier

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    path = merge_bench_detail({"attn_cross_routing_sweep": {
        "ms_per_iter": results,
        "shape": {"B": B, "H": H, "kv": LK, "ctx_dim": CTX},
        "pattern": "q/kv projections + attention + out-proj, 10-iter scan",
    }})
    print(f"BENCH_DETAIL entry written: attn_cross_routing_sweep -> {path}")


if __name__ == "__main__":
    main()
