"""Microbenchmark the SD UNet's component costs on the real TPU.

Each op runs inside a K-iteration ``lax.scan`` in ONE jitted program, so
per-dispatch overhead (significant through the tunneled runtime) amortizes
away — the same execution regime as the real sampler (one scan).

Run: python scripts/profile_sd_parts.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from superdiff_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from superdiff_tpu.utils.tunnel import require_tunnel  # noqa: E402

enable_compilation_cache()
require_tunnel("profile_sd_parts")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
K = 20  # scan iterations per timing


def sync(x):
    return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))


def timeit(name, fn, *args, flops=None):
    """fn(*args) -> array; timed as K scan iterations inside one jit."""

    def scanned(*a):
        def body(carry, _):
            out = fn(*a[:-1], carry)
            # keep dependency chain: re-inject a scalar into the carry input
            return carry + 1e-30 * out.astype(carry.dtype).reshape(carry.shape)[:1].sum(), ()

        c0 = jnp.zeros((1,), jnp.float32)
        c, _ = jax.lax.scan(lambda c, x: (body(c, x)[0], ()), c0, None, length=K)
        return c

    # simpler robust approach: chain outputs through the scan carry
    def scanned2(*a):
        x_last = a[-1]

        def body(x, _):
            out = fn(*a[:-1], x)
            return out, ()

        out, _ = jax.lax.scan(body, x_last, None, length=K)
        return out

    f = jax.jit(scanned2)
    sync(f(*args))
    sync(f(*args))
    t0 = time.perf_counter()
    out = f(*args)
    s = sync(out)
    dt = (time.perf_counter() - t0) / K * 1e3
    eff = f"  eff={flops / (dt * 1e-3) / 197e12 * 100:5.1f}%" if flops else ""
    print(f"{name:48s} {dt:9.3f} ms{eff}   (sink={s:.3e})")
    return dt


key = jax.random.PRNGKey(0)

print(f"== self-attention shapes (B={B}, chained via q) ==")
total_attn = {}
for L, inner, heads, n_layers in ((4096, 320, 8, 5), (1024, 640, 8, 5), (256, 1280, 8, 5), (64, 1280, 8, 1)):
    head_dim = inner // heads
    fl = 2 * 2 * B * L * L * inner
    k = jax.random.normal(key, (B, L, heads, head_dim), jnp.bfloat16)
    v = jax.random.normal(key, (B, L, heads, head_dim), jnp.bfloat16)
    q = jax.random.normal(key, (B, L, heads, head_dim), jnp.bfloat16)

    def dpa(kk, vv, qq):
        return jax.nn.dot_product_attention(qq, kk, vv)

    def einsum_attn(kk, vv, qq):
        logits = jnp.einsum("bqhd,bkhd->bhqk", qq, kk).astype(jnp.float32)
        attn = jax.nn.softmax(logits * (head_dim**-0.5), axis=-1).astype(vv.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", attn, vv)

    t = timeit(f"dpa    L={L} inner={inner} hd={head_dim}", dpa, k, v, q, flops=fl)
    timeit(f"einsum L={L} inner={inner}", einsum_attn, k, v, q, flops=fl)
    # merged single wide head (not math-equivalent; MXU shape probe only)
    k1 = k.reshape(B, L, 1, inner); v1 = v.reshape(B, L, 1, inner); q1 = q.reshape(B, L, 1, inner)
    timeit(f"1-head L={L} hd={inner}", dpa, k1, v1, q1, flops=fl)
    total_attn[L] = t * n_layers
print(f"-> projected self-attn total/fwd (dpa): {sum(total_attn.values()):.1f} ms  {total_attn}")

print(f"\n== conv stacks (B={B}, chained via x) ==")
import flax.linen as nn  # noqa: E402


total_conv = 0.0
for hw, ch, n_pairs in ((64, 320, 5), (32, 640, 5), (16, 1280, 5), (8, 1280, 3)):
    fl = 2 * 2 * B * hw * hw * 9 * ch * ch

    class ConvPair(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(ch, (3, 3), padding="SAME", dtype=jnp.bfloat16)(x)
            return nn.Conv(ch, (3, 3), padding="SAME", dtype=jnp.bfloat16)(h)

    x = jax.random.normal(key, (B, hw, hw, ch), jnp.bfloat16)
    m = ConvPair()
    p = jax.jit(m.init)(key, x)["params"]
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    t = timeit(f"conv3x3 pair {hw}x{hw} ch={ch}",
               lambda pp, xx: m.apply({"params": pp}, xx), p, x, flops=fl)
    total_conv += t * n_pairs
print(f"-> projected resnet-conv total/fwd: {total_conv:.1f} ms")

print(f"\n== glue ops (B={B}) ==")
from superdiff_tpu.models.unet import GroupNorm32  # noqa: E402

x = jax.random.normal(key, (B, 64, 64, 320), jnp.bfloat16)
gn = GroupNorm32()
gp = jax.jit(gn.init)(key, x)["params"]
timeit("GroupNorm32 64x64x320",
       lambda pp, xx: gn.apply({"params": pp}, xx).astype(jnp.bfloat16), gp, x)
x32 = jax.random.normal(key, (B, 32, 32, 640), jnp.bfloat16)
timeit("resize nearest 32->64 ch640",
       lambda xx: jax.image.resize(xx, (B, 64, 64, 640), method="nearest")[:, ::2, ::2], x32)
timeit("repeat-upsample 32->64 ch640",
       lambda xx: jnp.repeat(jnp.repeat(xx, 2, axis=1), 2, axis=2)[:, ::2, ::2], x32)

print(f"\n== GEGLU ff (B={B}) ==")
for L, ch in ((4096, 320), (1024, 640), (256, 1280)):
    fl = 2 * B * L * (ch * ch * 8 + 4 * ch * ch)

    class FF(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(ch * 8, dtype=jnp.bfloat16)(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate)
            return nn.Dense(ch, dtype=jnp.bfloat16)(h)

    x = jax.random.normal(key, (B, L, ch), jnp.bfloat16)
    m = FF()
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), jax.jit(m.init)(key, x)["params"])
    timeit(f"geglu-ff L={L} ch={ch}", lambda pp, xx: m.apply({"params": pp}, xx), p, x, flops=fl)

print(f"\n== full UNet forward (B={B}) ==")
from superdiff_tpu.models.sd.unet import SDUNet, SDUNetConfig  # noqa: E402

unet = SDUNet(SDUNetConfig())
lat = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
ctx = jnp.zeros((B, 77, 768), jnp.bfloat16)
params = jax.jit(unet.init)(key, lat[:1, :8, :8], jnp.zeros(()), ctx[:1])["params"]
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def fwd(p, c, l):
    return unet.apply({"params": p}, l, jnp.float32(500.0), c).astype(jnp.bfloat16)


t_full = timeit("SDUNet fwd", fwd, params, ctx, lat, flops=0.34e12 * B)
