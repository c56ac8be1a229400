"""Independent audit of the SD UNet FLOP count (VERDICT r2 item 3).

Every MFU number in STATUS.md / BENCH_DETAIL.json divides measured time into
a self-derived 0.34 TFLOP-per-forward figure. This script cross-checks it
two ways:

1. XLA's own `compile().cost_analysis()['flops']` of the full UNet forward,
   lowered with the pure-XLA kernels (attn_impl/ffn_impl = 'einsum' — Pallas
   custom calls are invisible to the XLA cost model), batch 1, 64x64x4
   latents (512px pixel space), 77-token context.
2. An analytic per-module sum (convs + attention + FFN + projections).

Note XLA counts a bf16 dot at its algebraic FLOPs; the einsum attention also
materializes the softmax (counted in `transcendentals`, not flops). The two
estimates should agree within a few percent; the audited value is written to
stdout as one JSON line for BENCH_DETAIL.

Run (CPU is fine; FLOPs are shape-arithmetic):
  JAX_PLATFORMS=cpu python scripts/flops_audit.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def analytic_flops(h=64, w=64, ctx_len=77):
    """Per-image UNet forward FLOPs (multiply-adds counted as 2)."""
    chans = (320, 640, 1280, 1280)
    total = 0.0
    notes = {}

    def conv(hh, ww, cin, cout, k=3):
        return 2.0 * hh * ww * cin * cout * k * k

    def dense(m, cin, cout):
        return 2.0 * m * cin * cout

    def resnet(hh, ww, cin, cout):
        f = conv(hh, ww, cin, cout) + conv(hh, ww, cout, cout)
        f += dense(1, 1280, cout)  # temb proj (per image, m=1)
        if cin != cout:
            f += conv(hh, ww, cin, cout, k=1)
        return f

    def transformer(hh, ww, c, heads=8):
        L = hh * ww
        f = dense(L, c, c) * 2  # proj_in / proj_out (1x1 convs as dense)
        # attn1: qkv + out projections, QK^T, PV
        f += dense(L, c, c) * 4
        f += 2.0 * heads * L * L * (c // heads) * 2
        # attn2: q from c, k/v from 768, logits/PV over ctx_len
        f += dense(L, c, c) * 2 + dense(ctx_len, 768, c) * 2
        f += 2.0 * heads * L * ctx_len * (c // heads) * 2
        # FFN: proj c->8c, out 4c->c
        f += dense(L, c, 8 * c) + dense(L, 4 * c, c)
        return f

    # conv_in / conv_out
    total += conv(h, w, 4, chans[0]) + conv(h, w, chans[0], 4)
    # time embed
    total += dense(1, chans[0], 1280) + dense(1, 1280, 1280)

    hh, ww = h, w
    skips = []  # (hh, ww, ch) of each stored skip
    ch = chans[0]
    skips.append((hh, ww, ch))
    for i, cout in enumerate(chans):
        has_attn = i < 3
        for _ in range(2):
            total += resnet(hh, ww, ch, cout)
            ch = cout
            if has_attn:
                total += transformer(hh, ww, ch)
            skips.append((hh, ww, ch))
        if i != 3:
            total += conv(hh // 2, ww // 2, ch, ch)  # strided downsample
            hh, ww = hh // 2, ww // 2
            skips.append((hh, ww, ch))

    # mid
    total += resnet(hh, ww, ch, ch) + transformer(hh, ww, ch) + resnet(hh, ww, ch, ch)

    # up path
    for i in range(4):
        level = 3 - i
        cout = chans[level]
        has_attn = level > 0
        for _ in range(3):
            sh, sw, sc = skips.pop()
            total += resnet(hh, ww, ch + sc, cout)
            ch = cout
            if has_attn:
                total += transformer(hh, ww, ch)
        if i != 3:
            hh, ww = hh * 2, ww * 2
            total += conv(hh, ww, ch, ch)  # post-upsample conv
    assert not skips
    notes["analytic_tflop"] = total / 1e12
    return total, notes


def main():
    from superdiff_tpu.models.sd.unet import SDUNet, SDUNetConfig

    analytic, notes = analytic_flops()

    cfg = SDUNetConfig(attn_impl="einsum", ffn_impl="einsum")
    unet = SDUNet(cfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((1, 77, 768), jnp.bfloat16)
    params = jax.eval_shape(lambda: unet.init(key, lat[:, :8, :8], jnp.zeros(()), ctx))

    def fwd(p, x, c):
        return unet.apply(p, x, jnp.float32(500.0), c)

    compiled = jax.jit(fwd).lower(params, lat, ctx).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops = float(ca.get("flops", float("nan")))

    out = {
        "xla_cost_analysis_tflop": xla_flops / 1e12,
        "analytic_tflop": analytic / 1e12,
        "ratio_xla_over_analytic": xla_flops / analytic,
        "bytes_accessed_gb_einsum_lowering": float(ca.get("bytes accessed", 0.0)) / 1e9,
        "transcendentals_g": float(ca.get("transcendentals", 0.0)) / 1e9,
        "note": (
            "per-image per-forward, 512px latents, einsum attention/FFN "
            "lowering (Pallas custom calls carry no XLA cost model); the "
            "Pallas lowering computes the same algebraic FLOPs minus the "
            "einsum path's extra softmax materialization"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
