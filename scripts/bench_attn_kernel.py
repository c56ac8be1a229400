"""A/B the long-row single-kv-block attention kernel variants on the chip.

The L=4096 self-attention tier is 61 ms of the 182 ms batch-24 UNet forward
and sits at ~78% of its lane-padding-discounted MXU bound (head_dim 40 pads
3.2x — STATUS.md's head-packing analysis shows that floor is geometric).
The remaining ~22% is NON-matmul time: inside one kernel program the chain
QK^T (MXU) -> max/exp2/sum (VPU) -> PV (MXU) serializes, so every VPU pass
over the (block_q, lk) probs tile is added latency. Variants:

  1block  current production kernel (fp32 probs, separate sum reduce)
  mxsum   ones-column on V folds the sum reduce into the PV matmul
          (lane 40..127 of the PV output are padding either way)
  pipe2   mxsum + two independent half-block chains, interleaved so the
          scheduler can overlap one half's VPU softmax with the other's MXU
  pvt1/2  transposed-PV: o^T = [V|1]^T p^T puts head_dim on MXU sublanes
          (41 -> 48 pad) instead of lanes (41 -> 128), ~31% fewer MXU units
          per chain; costs a sublane softmax reduce + in-kernel output
          transpose (the V^T feed itself fuses into the projection einsum)

Times the production attn1 pattern (projections + kernel + out-proj) inside
a 10-iter scan at the SD L0 shape (B=24, L=4096, C=320, H=8), both the
transpose path (attn_impl='flash') and the einsum-layout path ('flash_eo').
Winner becomes flash_attention._LONG_IMPL's committed default.

Run on the real chip:  python scripts/bench_attn_kernel.py
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

    require_tunnel("bench_attn_kernel")
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

    def attn_flash(x):
        qkv = x @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, D)
        k = k.reshape(B, L, H, D)
        v = v.reshape(B, L, H, D)
        o = fa.flash_mha(q, k, v)
        return o.reshape(B, L, C) @ wo

    def attn_flash_eo(x):
        w = wqkv.reshape(C, 3, H, D)
        q = jnp.einsum("blc,chd->bhld", x, w[:, 0])
        k = jnp.einsum("blc,chd->bhld", x, w[:, 1])
        v = jnp.einsum("blc,chd->bhld", x, w[:, 2])
        o = fa.flash_mha_bhld(q, k, v)
        return jnp.einsum("bhld,hdc->blc", o, wo.reshape(H, D, C))

    results = {}
    ref = None
    prev_bq = fa._LONG_BLOCK_Q
    # variant comparison pinned at bq512: '1block' keeps fp32 probs, whose
    # (bq, lk) score+probs tiles blow the 16 MB scoped-vmem stack at the
    # promoted bq1024 default (measured compile OOM at 20.86 MB) — 512 is
    # the like-for-like point every variant compiles at.
    fa._LONG_BLOCK_Q = 512
    for impl in ("1block", "mxsum", "pipe2", "pvt1", "pvt2"):
        fa._LONG_IMPL = impl
        for tag, body in (("flash", attn_flash), ("flash_eo", attn_flash_eo)):
            # a fresh jit around a fresh closure per variant: _LONG_IMPL is
            # read at trace time
            dt = timeit(f"{impl} / {tag}", scan(body), x)
            results[f"{impl}_{tag}"] = round(dt, 2)
            out = jax.jit(scan(body))(x)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"    max |diff| vs 1block/flash: {err:.3e}", flush=True)

    # second axis: q-block rows per program x chain count, einsum layout
    # only (the production path). block_q trades grid parallelism (more
    # programs to schedule across the cores) against per-chain matmul size;
    # pipe4 halves the chain size again at fixed block_q.
    bq_results = {}
    for impl in ("pipe2", "pipe4", "pvt1", "pvt2"):
        fa._LONG_IMPL = impl
        for bq in (256, 512, 1024, 2048):
            fa._LONG_BLOCK_Q = bq
            dt = timeit(f"{impl} / bq{bq} / flash_eo", scan(attn_flash_eo), x)
            bq_results[f"{impl}_bq{bq}"] = round(dt, 2)
            out = jax.jit(scan(attn_flash_eo))(x)
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"    max |diff| vs 1block/flash: {err:.3e}", flush=True)
    fa._LONG_IMPL = "pipe2"
    fa._LONG_BLOCK_Q = prev_bq

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    path = merge_bench_detail({"attn_long_kernel_sweep": {
        "ms_per_iter": results,
        "shape": {"B": B, "L": L, "C": C, "H": H, "D": D},
        "pattern": "projections + kernel + out-proj in a 10-iter scan",
    }, "attn_long_blockq_sweep": {
        "ms_per_iter": bq_results,
        "shape": {"B": B, "L": L, "C": C, "H": H, "D": D},
        "pattern": "flash_eo projections + kernel + out-proj, 10-iter scan",
    }})
    print(f"BENCH_DETAIL entries written: attn_long_*_sweep -> {path}")


if __name__ == "__main__":
    main()
