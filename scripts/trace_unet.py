"""Capture a jax.profiler trace of the real SD UNet forward (inside a
10-iteration lax.scan — the sampler's execution regime) and print per-op
and per-category durations parsed from the perfetto trace.

Run: python scripts/trace_unet.py [batch]
"""

import os
import shutil
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
FFN_IMPL = sys.argv[2] if len(sys.argv) > 2 else "fused"
# 3rd arg: attention impl ('flash' default; 'flash_nat' = the transpose-free
# packed-layout long-kv kernel, bench_attn_layout.py candidate (d))
ATTN_IMPL = sys.argv[3] if len(sys.argv) > 3 else "flash"
# 4th arg: upsampler ('repeat' default; 'subpixel' = fused 2x2x4F conv)
UPSAMPLE_IMPL = sys.argv[4] if len(sys.argv) > 4 else "repeat"
# 5th arg: 'dedup' = conditioning-dedup forward (latents at B//3, context at
# B: the sampler's 3-conditioning regime; output sliced back for the carry)
DEDUP = (sys.argv[5] if len(sys.argv) > 5 else "") == "dedup"
K = 10
LOGDIR = "/tmp/trace_unet"


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('trace_unet')
    from superdiff_tpu.models.sd.unet import SDUNet, SDUNetConfig

    key = jax.random.PRNGKey(0)
    unet = SDUNet(SDUNetConfig(
        ffn_impl=FFN_IMPL, attn_impl=ATTN_IMPL, upsample_impl=UPSAMPLE_IMPL,
    ))
    lat_b = B // 3 if DEDUP else B
    lat = jax.random.normal(key, (lat_b, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    params = jax.jit(unet.init)(key, lat[:1, :8, :8], jnp.zeros(()), ctx[:1])["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def scanned(p, c, l):
        def body(x, _):
            out = unet.apply({"params": p}, x, jnp.float32(500.0), c)
            # dedup mode: output batch is B; keep the carry at B//3
            return out[: x.shape[0]].astype(jnp.bfloat16), ()

        out, _ = jax.lax.scan(body, l, None, length=K)
        return out

    f = jax.jit(scanned)
    sync(f(params, ctx, lat))
    sync(f(params, ctx, lat))
    t0 = time.perf_counter()
    s = sync(f(params, ctx, lat))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"forward: {dt:.1f} ms/iter (batch {B}, sink={s:.3e})")

    shutil.rmtree(LOGDIR, ignore_errors=True)
    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    sync(f(params, ctx, lat))
    jax.profiler.stop_trace()

    # shared parser/taxonomy (utils/traceparse.py — also drives
    # scripts/trace_protein.py)
    from superdiff_tpu.utils import traceparse

    per_op = traceparse.load_device_ops(LOGDIR)
    parsed = traceparse.report(per_op, K)

    with open("/tmp/trace_unet_ops.txt", "w") as f:
        for name, dur in per_op.most_common():
            f.write(f"{dur/1e3/K:10.4f}\t{traceparse.category(name)}\t{name}\n")
    print("\nfull per-op table: /tmp/trace_unet_ops.txt")

    # persist into BENCH_DETAIL.json so the lever A/Bs regenerate the
    # committed artifact directly instead of living in /tmp logs
    from superdiff_tpu.utils.bench_io import merge_bench_detail

    entry_key = "sd_unet_fwd_b{}_{}_{}_{}{}".format(
        B, FFN_IMPL, ATTN_IMPL, UPSAMPLE_IMPL, "_dedup" if DEDUP else "")
    entry = {
        "wall_ms_per_iter": round(dt, 1),
        "device_ms_per_iter": round(parsed["total_device_ms_per_iter"], 1),
        "batch": B,
        "latent_batch": lat_b,
        "config": {"ffn": FFN_IMPL, "attn": ATTN_IMPL,
                   "upsample": UPSAMPLE_IMPL, "dedup": DEDUP},
        "categories_ms_per_iter": parsed["categories_ms_per_iter"],
    }
    merge_bench_detail({entry_key: entry})
    print(f"BENCH_DETAIL entry written: {entry_key}")


if __name__ == "__main__":
    main()
