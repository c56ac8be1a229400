"""On-chip block-size sweep for the fused GEGLU FFN block kernel.

Times geglu_ffn_block at the SD UNet's three widths (scan regime) across
(bm, bf) tiles; prints the per-width winner vs the built-in heuristic.

  python scripts/bench_geglu_blocks.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = 24
K = 10
LEVELS = (
    ("L0", 4096, 320),
    ("L1", 1024, 640),
    ("L2", 256, 1280),
)
CANDIDATES = ((256, 512), (512, 512), (512, 640), (512, 1280),
              (1024, 512), (1024, 1280), (2048, 512))


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('bench_geglu_blocks')
    from superdiff_tpu.ops.pallas import geglu_ffn as G

    sweep = {}
    for name, L, C in LEVELS:
        f = 4 * C
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B * L, C), jnp.bfloat16)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        w1 = (jax.random.normal(key, (C, 2 * f), jnp.bfloat16) * 0.02)
        b1 = jnp.zeros((2 * f,), jnp.float32)
        w2 = (jax.random.normal(key, (f, C), jnp.bfloat16) * 0.02)
        b2 = jnp.zeros((C,), jnp.float32)
        gflop = 24e-9 * x.shape[0] * C * C  # 24*M*C^2

        def run_once(tag):
            def scanned(xx):
                def body(h, _):
                    return G.geglu_ffn_block(
                        h, gamma, beta, w1, b1, w2, b2
                    ).astype(jnp.bfloat16), ()
                out, _ = jax.lax.scan(body, xx, None, length=K)
                return out

            fn = jax.jit(scanned)
            try:
                sync(fn(x)); sync(fn(x))
                t0 = time.perf_counter()
                sync(fn(x))
                dt = (time.perf_counter() - t0) / K * 1e3
                print(f"  {name} {tag:12s} {dt:7.3f} ms  "
                      f"{gflop/dt:6.0f} GF/ms->TF/s")
                return round(dt, 3)
            except Exception as e:  # VMEM OOM etc.
                print(f"  {name} {tag:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:80]}")
                return None

        level_ms = {}
        os.environ.pop("SUPERDIFF_GEGLU_BLOCKS", None)
        level_ms["heuristic"] = run_once("heuristic")
        for bm, bf in CANDIDATES:
            if bf > 2 * f:
                continue
            os.environ["SUPERDIFF_GEGLU_BLOCKS"] = f"{bm},{bf}"
            jax.clear_caches()
            level_ms[f"bm{bm}_bf{bf}"] = run_once(f"bm{bm}/bf{bf}")
        os.environ.pop("SUPERDIFF_GEGLU_BLOCKS", None)
        jax.clear_caches()
        sweep[f"{name}_L{L}_C{C}"] = level_ms

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    merge_bench_detail({"geglu_block_sweep_b24": {"ms_per_iter": sweep}})


if __name__ == "__main__":
    main()
