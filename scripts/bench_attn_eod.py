"""A/B the d-major (B,H,D,L) long-attention layout ('flash_eod') against
the promoted flash_eo/(B,H,L,D) path at the SD L0 production shape.

Motivation (trace + HLO): the flash_eo projection einsums write
(B,H,L,D), whose minor dim 40 pads to 128 lanes — each projection
measures ~0.4 ms (~25% MFU, `convolution_bitcast_fusion` in the trace)
and the q/o streams carry 3.2x their real bytes through HBM. The eod
layout keeps head_dim on sublanes (40 = 5 exact tiles): unpadded
projections, unpadded kernel streams, and the pvtd kernel writes its
transposed-PV output without the pvt kernels' final in-kernel transpose.
K stays (B,H,L,D) — the scores matmul consumes it natively.

Pattern: projections + kernel + out-proj in a 10-iter scan at
B=24, L=4096, C=320, H=8 (the shape behind `attn_long_blockq_sweep`,
where flash_eo/pvt1/bq2048 measured 11.73 ms/iter).

Run on the real chip:  python scripts/bench_attn_eod.py [L C]
(defaults 4096 320 — the L0 tier; 1024 640 = the mid tier, where the
bhld mh kernel is the incumbent)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B, H = 24, 8
L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
C = int(sys.argv[2]) if len(sys.argv) > 2 else 320
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
    print(f"{name:24s} {dt:7.2f} ms/iter  (sink {s:.3e})", flush=True)
    return dt


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel("bench_attn_eod")
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

    def attn_flash_eod(x):
        w = wqkv.reshape(C, 3, H, D)
        qt = jnp.einsum("blc,chd->bhdl", x, w[:, 0])
        k = jnp.einsum("blc,chd->bhld", x, w[:, 1])
        vt = jnp.einsum("blc,chd->bhdl", x, w[:, 2])
        ot = fa.flash_mha_eod(qt, k, vt)
        return jnp.einsum("bhdl,hdc->blc", ot, wo.reshape(H, D, C))

    results = {}
    ref = None
    for name, body, setup in (
        ("eo_pvt1_bq2048", attn_flash_eo, None),
        ("eod_pvtd1_bq2048", attn_flash_eod, ("pvtd1", 2048)),
        ("eod_pvtd2_bq2048", attn_flash_eod, ("pvtd2", 2048)),
        ("eod_pvtd1_bq4096", attn_flash_eod, ("pvtd1", 4096)),
        ("eod_pvtd2_bq4096", attn_flash_eod, ("pvtd2", 4096)),
        ("eod_pvtd1_bq1024", attn_flash_eod, ("pvtd1", 1024)),
    ):
        prev = (fa._EOD_IMPL, fa._LONG_BLOCK_Q)
        if setup:
            fa._EOD_IMPL, fa._LONG_BLOCK_Q = setup
        try:
            dt = timeit(name, scan(body), x)
            results[name] = round(dt, 2)
            out = jax.jit(scan(body))(x)
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"    max |diff| vs eo/pvt1: {err:.3e}", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"{name:24s} FAILED: {msg}", flush=True)
            results[name] = f"failed: {msg}"
        finally:
            fa._EOD_IMPL, fa._LONG_BLOCK_Q = prev

    from superdiff_tpu.utils.bench_io import merge_bench_detail

    key_name = ("attn_long_eod_sweep" if (L, C) == (4096, 320)
                else f"attn_eod_sweep_L{L}_C{C}")
    path = merge_bench_detail({key_name: {
        "ms_per_iter": results,
        "shape": {"B": B, "L": L, "C": C, "H": H, "D": D},
        "pattern": "projections + kernel + out-proj, 10-iter scan",
    }})
    print(f"BENCH_DETAIL entry written: {key_name} -> {path}")


if __name__ == "__main__":
    main()
