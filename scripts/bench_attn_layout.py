"""Measure q/k/v layout-production variants for the L0 flash-attention path.

The trace shows 15 ops x ~0.42 ms (batch 24) of (B,L,H,D)->(B,H,L,D)
transposes feeding the long-kv Pallas kernels (`convolution_bitcast_fusion`
in the HLO) plus the inverse transpose on the output. Candidates:

  a) packed: one (C, 3C) qkv matmul -> slice -> reshape -> transpose
     (current; one HBM read of x, three explicit transposes)
  b) per-proj einsum with transposed output: q = einsum('blc,chd->bhld')
     (three HBM reads of x, but XLA may write the matmul output directly
     in the permuted layout, killing the separate transpose op)
  c) out-side only: attention output consumed as (B,H,L,D) by
     einsum('bhld,hdc->blc') into to_out (kills the 4th transpose).
  d) packed + native_long_kv kernel: the transpose-free packed-layout
     Pallas path at kv=4096 (zero layout copies end to end; small q
     blocks bound the unrolled per-head score tiles).

Run on the real chip:  python scripts/bench_attn_layout.py
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
    print(f"{name:34s} {dt:7.2f} ms/iter  (sink {s:.3e})")
    return dt


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('bench_attn_layout')
    from superdiff_tpu.ops.pallas.flash_attention import flash_mha

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

    def attn_packed(x):
        qkv = x @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, D)
        k = k.reshape(B, L, H, D)
        v = v.reshape(B, L, H, D)
        o = flash_mha(q, k, v)
        return o.reshape(B, L, C) @ wo

    def attn_einsum_layout(x):
        w = wqkv.reshape(C, 3, H, D)
        q = jnp.einsum("blc,chd->bhld", x, w[:, 0])
        k = jnp.einsum("blc,chd->bhld", x, w[:, 1])
        v = jnp.einsum("blc,chd->bhld", x, w[:, 2])
        # flash_mha takes (B, L, H, D); bypass to the impl layout by
        # transposing the wrapper's expectation — i.e. hand it the already
        # (B,H,L,D) tensors as if (B,L,H,D) with pre-transposed semantics.
        from superdiff_tpu.ops.pallas.flash_attention import _flash_impl
        o = _flash_impl(q, k, v, D**-0.5, 512, L, False)  # (B,H,L,D)
        return jnp.einsum("bhld,hdc->blc", o, wo.reshape(H, D, C))

    def attn_packed_outeinsum(x):
        qkv = x @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        from superdiff_tpu.ops.pallas.flash_attention import _flash_impl
        o = _flash_impl(q, k, v, D**-0.5, 512, L, False)  # (B,H,L,D)
        return jnp.einsum("bhld,hdc->blc", o, wo.reshape(H, D, C))

    def attn_packed_native(x):
        qkv = x @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, D)
        k = k.reshape(B, L, H, D)
        v = v.reshape(B, L, H, D)
        o = flash_mha(q, k, v, native_long_kv=True)
        return o.reshape(B, L, C) @ wo

    res = {
        "a_packed_transposes": timeit(
            "a) packed + transposes (current)", scan(attn_packed), x),
        "b_einsum_layout_out": timeit(
            "b) einsum layout-out projections", scan(attn_einsum_layout), x),
        "c_packed_out_einsum": timeit(
            "c) packed + out-side einsum", scan(attn_packed_outeinsum), x),
        "d_packed_native_long_kv": timeit(
            "d) packed + native_long_kv kernel", scan(attn_packed_native), x),
    }
    from superdiff_tpu.utils.bench_io import merge_bench_detail

    merge_bench_detail({"attn_layout_sweep_b24_L4096": {
        "ms_per_iter": {k: round(v, 2) for k, v in res.items()},
        "shape": {"B": B, "L": L, "C": C, "H": H},
    }})


if __name__ == "__main__":
    main()
