"""A/B the mid attention tier's kernel routing on the chip.

The SD 32x32 self-attention level (B=24, L=1024, C=640, H=8, D=80) routes
to the all-heads-per-program kernel (``_kernel_mh``) because its kv row is
short enough for one program. But the pvt sweep on the long tier
(BENCH_DETAIL attn_long_blockq_sweep) showed that transposing the PV
matmul — head_dim on MXU *sublanes* (81 -> 88, 1.09x pad) instead of
*lanes* (81 -> 128, 1.58x) — cuts real time, and the per-head long kernels
can serve any single-block row by lowering ``_MH_MAX_KV``. Variants:

  mh      current production routing (all heads per program, fori_loop)
  pipe2   per-head long kernel, mxsum + two interleaved chains
  pvt1/2  per-head transposed-PV kernels

Times the production attn1 pattern (projections + kernel + out-proj)
inside a 10-iter scan, einsum layout (the production path). Winner
decides whether ``_MH_MAX_KV`` drops below 1024 as the committed default.

Run on the real chip:  python scripts/bench_attn_mid.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B, L, C, H = 24, 1024, 640, 8
D = C // H
K = 10


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args))
    sync(f(*args))
    t0 = time.perf_counter()
    s = sync(f(*args))
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:40s} {dt:7.2f} ms/iter  (sink {s:.3e})", flush=True)
    return dt


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("bench_attn_mid")
    import superdiff_tpu.ops.pallas.flash_attention as fa

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, C), jnp.bfloat16)
    wqkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.05
    wo = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.05

    def scan(body):
        def fn(x):
            def step(h, _):
                return body(h).astype(jnp.bfloat16), ()

            out, _ = jax.lax.scan(step, x, None, length=K)
            return out

        return fn

    def attn_flash_eo(x):
        w = wqkv.reshape(C, 3, H, D)
        q = jnp.einsum("blc,chd->bhld", x, w[:, 0])
        k = jnp.einsum("blc,chd->bhld", x, w[:, 1])
        v = jnp.einsum("blc,chd->bhld", x, w[:, 2])
        o = fa.flash_mha_bhld(q, k, v)
        return jnp.einsum("bhld,hdc->blc", o, wo.reshape(H, D, C))

    results = {}
    prev_mh, prev_impl = fa._MH_MAX_KV, fa._LONG_IMPL
    ref = None
    try:
        for name, mh_max, impl in (
            ("mh", 1024, "pvt1"),
            ("pipe2", 256, "pipe2"),
            ("pvt1", 256, "pvt1"),
            ("pvt2", 256, "pvt2"),
        ):
            fa._MH_MAX_KV = mh_max
            fa._LONG_IMPL = impl
            dt = timeit(f"{name} / flash_eo", scan(attn_flash_eo), x)
            results[name] = round(dt, 2)
            out = jax.jit(scan(attn_flash_eo))(x)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"    max |diff| vs mh: {err:.3e}", flush=True)
    finally:
        fa._MH_MAX_KV, fa._LONG_IMPL = prev_mh, prev_impl

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    path = merge_bench_detail({"attn_mid_routing_sweep": {
        "ms_per_iter": results,
        "shape": {"B": B, "L": L, "C": C, "H": H, "D": D},
        "pattern": "flash_eo projections + kernel + out-proj, 10-iter scan",
    }})
    print(f"BENCH_DETAIL entry written: attn_mid_routing_sweep -> {path}")


if __name__ == "__main__":
    main()
