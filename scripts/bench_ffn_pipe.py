"""A/B the FFN kernel's row-chain split (geglu_ffn._PIPE) on the chip.

Inside one fused-FFN program the chain matmul->gelu->matmul serializes the
MXU and VPU; the exact-gelu polynomial is ~20 VPU ops/element over the
(bm, F) gate tile (~5.6 ms of the 25.2 ms tier at batch 24, vs the
19.6 ms pure-MXU bound). Splitting the row block into independent chains
gives the scheduler slack to overlap one chain's VPU with another's MXU.

Times geglu_ffn_block at the SD UNet's two dominant transformer tiles in a
10-iter scan, for pipe in {1, 2, 4}; winner becomes the committed default.

Run on the real chip:  python scripts/bench_ffn_pipe.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

K = 10
TILES = {
    # (rows, C, F): L0 = 24x4096 tokens at 320; L1 = 24x1024 at 640
    "L0_b24": (24 * 4096, 320, 1280),
    "L1_b24": (24 * 1024, 640, 2560),
}


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("bench_ffn_pipe")
    import superdiff_tpu.ops.pallas.geglu_ffn as gf

    results = {}
    for name, (m, c, f) in TILES.items():
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (m, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        w1 = jax.random.normal(key, (c, 2 * f), jnp.bfloat16) * 0.03
        b1 = jnp.zeros((2 * f,), jnp.float32)
        w2 = jax.random.normal(key, (f, c), jnp.bfloat16) * 0.03
        b2 = jnp.zeros((c,), jnp.float32)

        ref = None
        for pipe in (1, 2, 4):
            gf._PIPE = pipe

            def scanned(x):
                def step(h, _):
                    o = gf.geglu_ffn_block(
                        h, gamma, beta, w1, b1, w2, b2, eps=1e-5,
                        approximate=False,
                    )
                    return o.astype(jnp.bfloat16), ()

                out, _ = jax.lax.scan(step, x, None, length=K)
                return out

            fn = jax.jit(scanned)
            sync(fn(x))
            sync(fn(x))
            t0 = time.perf_counter()
            s = sync(fn(x))
            dt = (time.perf_counter() - t0) / K * 1e3
            print(f"{name} pipe={pipe}: {dt:7.2f} ms/iter (sink {s:.3e})",
                  flush=True)
            results[f"{name}_pipe{pipe}"] = round(dt, 2)
            out = fn(x)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"    max |diff| vs pipe=1: {err:.3e}", flush=True)
    gf._PIPE = 1

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    path = merge_bench_detail({"ffn_pipe_sweep": {
        "ms_per_iter": results,
        "note": "fused LN+GEGLU+out-proj+residual block, exact gelu, "
                "10-iter scan; pipe = independent row-chain splits per "
                "kernel program",
    }})
    print(f"BENCH_DETAIL entry written: ffn_pipe_sweep -> {path}")


if __name__ == "__main__":
    main()
