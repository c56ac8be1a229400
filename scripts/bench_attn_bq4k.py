"""Extend the long-attention block_q sweep to bq=4096 (one program per
(b, h) at the SD L0 shape) for the transposed-PV kernel family.

The committed sweep (BENCH_DETAIL ``attn_long_blockq_sweep``) stopped at
bq 2048, where pvt1 (single full-block chain) was the monotone winner —
larger chains kept beating chain-splitting overlap (pvt1@2048 11.73 ms vs
pvt2@2048 12.12). bq 4096 is the end of that axis: pvt1@4096 is one
(4096, 4096) fp32 score tile (64 MB — needs the full VMEM budget), while
pvt2/pvt4@4096 re-test MXU/VPU chain overlap at the 2048/1024 chain sizes
that already measured best. Compile OOMs are recorded as results.

Run on the real chip:  python scripts/bench_attn_bq4k.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B, L, C, H = 24, 4096, 320, 8
D = C // H
K = 10


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("bench_attn_bq4k")
    import superdiff_tpu.ops.pallas.flash_attention as fa

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, C), jnp.bfloat16)
    wqkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.05
    wo = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.05

    def attn_flash_eo(x):
        w = wqkv.reshape(C, 3, H, D)
        q = jnp.einsum("blc,chd->bhld", x, w[:, 0])
        k = jnp.einsum("blc,chd->bhld", x, w[:, 1])
        v = jnp.einsum("blc,chd->bhld", x, w[:, 2])
        o = fa.flash_mha_bhld(q, k, v)
        return jnp.einsum("bhld,hdc->blc", o, wo.reshape(H, D, C))

    def scanned(x):
        def step(h, _):
            return attn_flash_eo(h).astype(jnp.bfloat16), ()

        out, _ = jax.lax.scan(step, x, None, length=K)
        return out

    prev = (fa._LONG_IMPL, fa._LONG_BLOCK_Q, fa._VMEM_LIMIT_BYTES)
    fa._VMEM_LIMIT_BYTES = 127 * 1024 * 1024
    results = {}
    # control at the committed default, then the bq-4096 candidates
    cases = [("pvt1", 2048), ("pvt1", 4096), ("pvt2", 4096), ("pvt4", 4096)]
    ref = None
    for impl, bq in cases:
        fa._LONG_IMPL, fa._LONG_BLOCK_Q = impl, bq
        name = f"{impl}_bq{bq}"
        try:
            f = jax.jit(scanned)
            sync(f(x))
            sync(f(x))
            t0 = time.perf_counter()
            s = sync(f(x))
            dt = (time.perf_counter() - t0) / K * 1e3
            print(f"{name:20s} {dt:7.2f} ms/iter  (sink {s:.3e})", flush=True)
            results[name] = round(dt, 2)
            out = f(x)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"    max |diff| vs pvt1_bq2048: {err:.3e}", flush=True)
        except Exception as e:  # compile OOM is an expected outcome
            msg = str(e).splitlines()[0][:160]
            print(f"{name:20s} FAILED: {msg}", flush=True)
            results[name] = f"failed: {msg}"
    fa._LONG_IMPL, fa._LONG_BLOCK_Q, fa._VMEM_LIMIT_BYTES = prev

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    path = merge_bench_detail({"attn_long_bq4096_sweep": {
        "ms_per_iter": results,
        "shape": {"B": B, "L": L, "C": C, "H": H, "D": D},
        "vmem_limit_mb": 127,
        "pattern": "flash_eo projections + kernel + out-proj, 10-iter scan",
    }})
    print(f"BENCH_DETAIL entry written: attn_long_bq4096_sweep -> {path}")


if __name__ == "__main__":
    main()
