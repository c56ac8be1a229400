"""Stable-Diffusion 1.x conditional UNet, TPU-first Flax implementation.

Same capability as the diffusers ``UNet2DConditionModel`` the reference loads
(``applications/images/clip_eval.py:34-36``), re-designed for TPU:

* NHWC end-to-end, bf16 compute / fp32 params, fp32 softmax+GroupNorm.
* Attention is plain einsum attention (MXU-friendly at these sizes: 4096
  tokens max) and therefore differentiable under ``jax.jvp`` — the ODE Itô
  estimator needs forward-mode through the net, which forced the reference
  to switch off flash attention (``clip_eval.py:97``).
* Multi-head layout keeps heads in the batch dims of a single batched
  einsum; no per-head Python loops.
* The epsilon-prediction output stays fp32 (density accumulators are fp32).

Weight conversion from HF safetensors lives in ``convert.py``; with no local
weights the model runs with random init (identical compute graph, used by
``bench.py`` for throughput measurement).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..unet import GroupNorm32

Array = jax.Array


def sd_timestep_embedding(t: Array, dim: int, max_period: float = 10_000.0) -> Array:
    """Diffusers ``Timesteps`` convention: exponent ``arange(half)/half``
    (freq_shift 0) and cos-first ordering (``flip_sin_to_cos=True``) — must
    match exactly for converted HF weights to be usable."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32).reshape(-1, 1) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    """SD-1.x defaults (CompVis/stable-diffusion-v1-4 unet/config.json)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # heads per attention (SD1.x: 8 heads)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    norm_num_groups: int = 32
    # Kernel selection (see CrossAttention / TransformerBlock docstrings);
    # 'einsum' variants give the pure-XLA lowering (used e.g. by the FLOP
    # audit, where Pallas custom calls are invisible to cost_analysis).
    # 'flash_eo' promoted to default after the on-chip A/B (headline
    # 0.8788 -> 0.9125 img/s; data-formatting tier 12.6 -> 3.3 ms/forward,
    # BENCH_DETAIL sd_headline_flash_eo / trace_unet): einsum-layout
    # projections write q/k/v directly in the long-kv kernel's (B,H,L,D)
    # layout, deleting 4 layout copies per self-attention layer.
    # 'flash_eod' (promoted after the next on-chip A/B, BENCH_DETAIL
    # attn_long_eod_sweep: 10.97 vs 11.70 ms/iter at the L0 pattern)
    # additionally keeps q/v/o in the d-major (B,H,D,L) layout on the
    # 4096-token tier: head_dim 40 = 5 exact sublane tiles, so the
    # projections and kernel streams run without the 40->128 lane pad.
    attn_impl: str = "flash_eod"
    ffn_impl: str = "fused"
    # 'repeat' = nearest-2x repeat + 3x3 conv (the diffusers Upsample2D
    # semantics, literally); 'subpixel' (default after the on-chip A/B:
    # headline 0.8788 -> 0.8885 standalone, BENCH_DETAIL
    # sd_headline_subpixel) = the same map algebraically fused into one
    # 2x2x(4*C_out) conv on the SMALL grid + phase interleave (4/9 the
    # FLOPs, no upsampled intermediate in HBM) — see SubpixelUpsample.
    # Same param tree as 'repeat' (converter-compatible, equality-tested).
    upsample_impl: str = "subpixel"

    @staticmethod
    def tiny() -> "SDUNetConfig":
        """Small config for tests: same topology, 1/16 width."""
        return SDUNetConfig(
            block_out_channels=(32, 64, 64, 64),
            cross_attention_dim=64,
            attention_head_dim=4,
        )


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    ``attn_impl``:
      * 'flash' (default): the Pallas online-softmax kernel
        (``ops/pallas/flash_attention.py``). XLA's own lowering materializes
        the fp32 logits — f32[B,8,4096,4096] = 12.9 GB at batch 24 — through
        HBM, measured ~52 ms/layer on v5e; the kernel does one HBM pass
        (~15 ms, at the head_dim-40 padded-MXU bound). Short-kv cross
        attention (77 text tokens) auto-falls back to the einsum path.
      * 'dpa': ``jax.nn.dot_product_attention``.
      * 'einsum': explicit fp32-softmax einsum path.
    All are forward-mode differentiable — 'flash' carries a custom_jvp rule
    routing tangents through the einsum path (the ODE Itô estimator jvp's
    through the UNet; the torch reference had to disable flash for this,
    ``clip_eval.py:97``).
    """

    query_dim: int
    heads: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "flash"

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.query_dim
        head_dim = inner // self.heads
        # Packed projections: one (C, 3C) matmul for self-attention qkv (or
        # (C, 2C) for cross-attention kv) instead of three Dense calls —
        # one HBM read of the (M, C) stream instead of three, and a wider
        # MXU N dim. Param tree/init identical to the three nn.Dense
        # modules (the converter paths to_q/to_k/to_v are unchanged).
        wq, = _KernelParams(x.shape[-1], inner, name="to_q")()
        ctx_dim = x.shape[-1] if context is None else context.shape[-1]
        wk, = _KernelParams(ctx_dim, inner, name="to_k")()
        wv, = _KernelParams(ctx_dim, inner, name="to_v")()
        xc = x.astype(self.dtype)
        if (self.attn_impl == "flash_eod" and context is None
                and x.shape[1] > 256):
            # 'flash_eod': the long self-attention tiers (4096- and
            # 1024-token) in the d-major layout — q/v/o in (B,H,D,L), k
            # in (B,H,L,D); per-tier kernel selection in flash_mha_eod. The
            # projections write unpadded (head_dim 40 = 5 exact sublane
            # tiles vs a 40->128 lane pad in bhld, which measured ~25%
            # MFU as `convolution_bitcast_fusion` ops), the pvtd kernel
            # consumes both layouts natively, and the out-projection
            # contracts from d-major. A/B: BENCH_DETAIL
            # attn_long_eod_sweep. Param tree unchanged.
            from ...ops.pallas.flash_attention import flash_mha_eod

            nh, hd = self.heads, head_dim
            qt = jnp.einsum(
                "blc,chd->bhdl", xc, wq.astype(self.dtype).reshape(-1, nh, hd))
            k = jnp.einsum(
                "blc,chd->bhld", xc, wk.astype(self.dtype).reshape(-1, nh, hd))
            vt = jnp.einsum(
                "blc,chd->bhdl", xc, wv.astype(self.dtype).reshape(-1, nh, hd))
            ot = flash_mha_eod(qt, k, vt)
            wo, bo = _DenseParams(inner, inner, name="to_out")()
            return jnp.einsum(
                "bhdl,hdc->blc", ot, wo.astype(self.dtype).reshape(nh, hd, -1)
            ) + bo.astype(self.dtype)
        if (self.attn_impl in ("flash_eo", "flash_eod") and context is None
                and x.shape[1] > 256):
            # 'flash_eo' (einsum-layout-out, bench_attn_layout.py variant
            # (b), measured 15.00 vs 15.73 ms for (a) at B24/L4096): the
            # per-projection einsums write q/k/v directly in the kernel's
            # (B, H, L, D) layout and the out-projection consumes it, so
            # the 4 per-layer layout copies of the (B, L, C) stream that
            # flash_mha's transposes cost never exist. Self-attention with
            # L > 256 only — short rows already ride the transpose-free
            # packed kernel. Param tree (to_q/k/v, to_out kernel+bias)
            # unchanged.
            from ...ops.pallas.flash_attention import flash_mha_bhld

            nh, hd = self.heads, head_dim
            q = jnp.einsum(
                "blc,chd->bhld", xc, wq.astype(self.dtype).reshape(-1, nh, hd))
            k = jnp.einsum(
                "blc,chd->bhld", xc, wk.astype(self.dtype).reshape(-1, nh, hd))
            v = jnp.einsum(
                "blc,chd->bhld", xc, wv.astype(self.dtype).reshape(-1, nh, hd))
            o = flash_mha_bhld(q, k, v)
            wo, bo = _DenseParams(inner, inner, name="to_out")()
            return jnp.einsum(
                "bhld,hdc->blc", o, wo.astype(self.dtype).reshape(nh, hd, -1)
            ) + bo.astype(self.dtype)
        if self.attn_impl == "einsum":
            # The einsum lowering is the tensor-parallel path
            # (parallel/tp.py): separate matmuls keep each column-sharded
            # projection a clean Megatron column-parallel op. The packed
            # concat's qkv split forced GSPMD to insert 7 collective-
            # permutes per self-attention (measured; tests/test_tp.py
            # collective-count pin).
            ctx = xc if context is None else context.astype(self.dtype)
            q = xc @ wq.astype(self.dtype)
            k = ctx @ wk.astype(self.dtype)
            v = ctx @ wv.astype(self.dtype)
        elif context is None:
            qkv = xc @ jnp.concatenate(
                [wq, wk, wv], axis=1
            ).astype(self.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            ctx = context.astype(self.dtype)
            q = xc @ wq.astype(self.dtype)
            kv = ctx @ jnp.concatenate([wk, wv], axis=1).astype(self.dtype)
            k, v = jnp.split(kv, 2, axis=-1)
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, head_dim)
        k = k.reshape(b, lk, self.heads, head_dim)
        v = v.reshape(b, lk, self.heads, head_dim)
        if self.attn_impl in ("flash", "flash_nat", "flash_eo", "flash_eod"):
            # 'flash_eo' reaches here for cross-attention and short rows,
            # where the standard dispatch is already transpose-free
            from ...ops.pallas.flash_attention import flash_mha

            # 'flash_nat' opts the long-kv self-attention into the
            # transpose-free packed-layout kernel path (pending hardware
            # measurement; scripts/bench_attn_layout.py candidate (d))
            out = flash_mha(
                q, k, v, native_long_kv=self.attn_impl == "flash_nat"
            )
        elif self.attn_impl == "dpa":
            out = jax.nn.dot_product_attention(q, k, v)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            attn = jax.nn.softmax(logits * (head_dim**-0.5), axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, lq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    """``v * gelu(g)`` with a stacked (C, 2, F) projection kernel.

    Exact (erf) gelu: diffusers' GEGLU applies ``F.gelu`` with its erf
    default (the reference model is ``CompVis/stable-diffusion-v1-4``,
    driven at ``applications/images/clip_eval.py:29-43``), so converted
    real checkpoints see the same nonlinearity."""

    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w, b = _GEGLUProjParams(x.shape[-1], self.dim_out, name="proj")()
        h = jnp.einsum(
            "...c,cgf->...gf", x.astype(self.dtype), w.astype(self.dtype)
        ) + b.astype(self.dtype)
        return h[..., 0, :] * nn.gelu(h[..., 1, :], approximate=False)


class _KernelParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense(use_bias=False)``: identical
    param tree (kernel) and init, returned instead of applied — used to
    pack the q/k/v projections into one matmul while keeping the converter
    paths (``to_q``/``to_k``/``to_v``) unchanged."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, ...]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        return (kernel,)


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``: identical param tree
    (kernel/bias) and init, but returns the tensors instead of applying
    them — so the fused FFN kernel can consume them while the checkpoint
    converter paths (``ff_geglu/proj``, ``ff_out``) stay unchanged."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class _GEGLUProjParams(nn.Module):
    """GEGLU projection params with value/gate STACKED: kernel
    (C, 2, F), bias (2, F) — axis 1 indexes (value, gate).

    Bytes identical to diffusers' packed (C, 2F) layout (a free row-major
    reshape; ``models/sd/convert.py`` reshapes on load, and the fused
    Pallas kernel consumes the flat view via ``.reshape``). The stacked
    shape exists for tensor parallelism: a ``P(None, None, 'tp')`` sharding
    keeps each device's value/gate slices aligned, whereas sharding the
    packed 2F axis forced GSPMD to all-gather the whole (M, 2F) FFN hidden
    per block (measured; tests/test_tp.py pins the collective counts).
    Init draws are bit-identical to the former ``nn.Dense(2F)`` kernel."""

    in_features: int
    hidden: int  # F

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        def kinit(key, shape, dtype):
            c, two, f = shape
            flat = nn.initializers.lecun_normal()(key, (c, two * f), dtype)
            return flat.reshape(shape)

        kernel = self.param(
            "kernel", kinit, (self.in_features, 2, self.hidden), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (2, self.hidden), jnp.float32
        )
        return kernel, bias


class _GEGLUParams(nn.Module):
    """Param-tree twin of :class:`GEGLU` (child module named ``proj``)."""

    in_features: int
    features: int  # 2F

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        return _GEGLUProjParams(
            self.in_features, self.features // 2, name="proj"
        )()


class _LayerNormParams(nn.Module):
    """Param-tree twin of ``nn.LayerNorm`` (scale/bias)."""

    features: int

    @nn.compact
    def __call__(self) -> Tuple[Array, Array]:
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return scale, bias


class TransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU FFN, pre-LayerNorm residuals.

    ``ffn_impl``:
      * 'fused' (default): the whole FFN sub-block — fp32 LayerNorm, GEGLU,
        out-projection, residual — as one Pallas kernel
        (``ops/pallas/geglu_ffn.geglu_ffn_block``): one HBM read of the
        (M, C) stream and one write, vs XLA's fp32 LN round-trip + two
        matmul round-trips + residual pass. Forward-mode differentiable
        (custom_jvp via the einsum reference, same pattern as flash
        attention).
      * 'einsum': the plain LayerNorm + two-Dense lowering.
    Both read the same parameters at the same tree paths.
    """

    dim: int
    heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    ffn_impl: str = "fused"
    attn_impl: str = "flash"

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x + CrossAttention(
            self.dim, self.heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn1",
        )(h)
        if context.shape[0] != x.shape[0]:
            # conditioning dedup (see SDUNet docstring): the latent batch
            # was passed once for g conditioning groups; everything above —
            # including the expensive 4096-token attn1 — ran at batch b.
            # Expand group-major here, where context first enters.
            x = jnp.tile(x, (context.shape[0] // x.shape[0], 1, 1))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.context_dim, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn2",
        )(h, context)
        inner = self.dim * 4
        if self.ffn_impl == "fused":
            from ...ops.pallas.geglu_ffn import geglu_ffn_block

            gamma, beta = _LayerNormParams(self.dim, name="norm3")()
            w1, b1 = _GEGLUParams(self.dim, 2 * inner, name="ff_geglu")()
            w2, b2 = _DenseParams(inner, self.dim, name="ff_out")()
            # (C, 2, F) -> (C, 2F): free row-major view; the kernel reads
            # the value/gate halves via BlockSpec index maps. Exact erf
            # gelu matches diffusers (see GEGLU docstring).
            x = geglu_ffn_block(
                x.astype(self.dtype), gamma, beta,
                w1.reshape(self.dim, 2 * inner).astype(self.dtype),
                b1.reshape(2 * inner),
                w2.astype(self.dtype), b2, eps=1e-5, approximate=False,
            )
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
            h = GEGLU(inner, dtype=self.dtype, name="ff_geglu")(h)
            x = x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> proj_in -> transformer block(s) -> proj_out, residual."""

    channels: int
    heads: int
    context_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    ffn_impl: str = "fused"
    attn_impl: str = "flash"

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        # diffusers Transformer2DModel input GroupNorm uses eps 1e-6
        z = GroupNorm32(eps=1e-6, name="norm")(x)
        z = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(z)
        z = z.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            z = TransformerBlock(
                self.channels, self.heads, self.context_dim, self.dtype,
                self.ffn_impl, self.attn_impl, name=f"block_{i}",
            )(z, context)
        # batch may have grown inside the block (conditioning dedup)
        z = z.reshape(-1, h, w, self.channels)
        z = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(z)
        if z.shape[0] != residual.shape[0]:
            residual = jnp.tile(residual, (z.shape[0] // residual.shape[0], 1, 1, 1))
        return z + residual


class _Conv1x1(nn.Module):
    """1x1 conv expressed as the dot it is: params identical to ``nn.Conv``
    ((1, 1, C, F) ``kernel`` + ``bias``, same init), compute via einsum.

    XLA lowers a single-chip 1x1 conv to this dot anyway; the explicit dot
    exists because GSPMD MISPARTITIONS the conv form when it is vmapped
    over an ensemble-stacked, 'model'-sharded parameter axis (wrong values,
    max-err O(10) — minimal repro in
    ``tests/test_tp.py::test_vmapped_1x1_conv_gspmd_workaround``), while
    the dot partitions correctly."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jnp.einsum(
            "bhwc,cf->bhwf", x.astype(self.dtype), kernel[0, 0].astype(self.dtype)
        )
        return y + bias.astype(self.dtype)


class ResnetBlock2D(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        h = nn.swish(GroupNorm32(name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        te = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(
            nn.swish(temb)
        )
        if te.shape[0] != h.shape[0]:
            # conditioning dedup: temb was built at the deduped batch; all
            # groups share t, so the tile is exact
            te = jnp.tile(te, (h.shape[0] // te.shape[0], 1))
        h = h + te[:, None, None, :]
        h = nn.swish(GroupNorm32(name="norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = _Conv1x1(self.out_ch, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class SubpixelUpsample(nn.Module):
    """Nearest-2x upsample + 3x3 SAME conv, fused into a single 2x2 conv on
    the small grid plus a phase interleave.

    With nearest upsampling ``U[p, q] = x[p//2, q//2]``, the 3x3 window of
    output pixel ``(2i+di, 2j+dj)`` only ever touches TWO distinct source
    rows/cols per axis, so each of the 4 phases reduces to a 2x2 conv whose
    taps are sums of the original 3x3 taps: per axis, phase 0 combines rows
    as ``[[1,0,0],[0,1,1]]`` (offset -1 alone; offsets 0 and +1 both read
    ``x[i]``) and phase 1 as ``[[1,1,0],[0,0,1]]``. All 4 phase kernels run
    as ONE conv with 4x the output channels at padding (1,1) (phase d reads
    conv output index ``i+d``), so the MXU matmul keeps its full N width.

    Cost: 16 vs 36 MACs per output pixel (2.25x fewer FLOPs) and the
    (2H, 2W, C) upsampled intermediate never exists in HBM. Bitwise it
    differs from the unfused form only in summing weight taps (fp32, cast
    once) before the multiply instead of summing products.

    Params are named/shaped identically to the ``nn.Conv`` it replaces
    ((3,3,C,F) ``kernel`` + ``bias``), so converted diffusers checkpoints
    (``models/sd/convert.py``) load unchanged. Behavior target: the
    torch Upsample2D interpolate+conv inside the UNet the reference drives
    (applications/images/clip_eval.py:55's diffusers pipeline)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = self.features
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, f), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        m0 = jnp.array([[1, 0, 0], [0, 1, 1]], jnp.float32)
        m1 = jnp.array([[1, 1, 0], [0, 0, 1]], jnp.float32)
        ms = jnp.stack([m0, m1])  # (2, 2, 3) [phase, tap, src-offset]
        # (di, dj, a, b, c, f): phase-combined 2x2 kernels from the 3x3 taps
        k4 = jnp.einsum("dau,ebv,uvcf->deabcf", ms, ms, kernel)
        k4 = k4.transpose(2, 3, 4, 0, 1, 5).reshape(2, 2, c, 4 * f)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k4.astype(self.dtype),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(bias, 4).astype(self.dtype)
        b_, h, w = x.shape[0], x.shape[1], x.shape[2]
        rows = [
            jnp.stack(
                [
                    y[:, di : h + di, dj : w + dj, (2 * di + dj) * f : (2 * di + dj + 1) * f]
                    for dj in (0, 1)
                ],
                axis=3,
            )
            for di in (0, 1)
        ]  # each (B, H, W, 2, F)
        z = jnp.stack(rows, axis=2)  # (B, H, 2, W, 2, F)
        return z.reshape(b_, 2 * h, 2 * w, f)


class SDUNet(nn.Module):
    """UNet2DConditionModel equivalent: (latents NHWC, t, context) -> eps.

    **Conditioning dedup**: when ``context.shape[0]`` is an integer multiple
    g of ``x.shape[0]``, the latent batch is treated as shared across g
    conditioning groups (group-major, matching
    ``jnp.concatenate([ctx_a, ctx_b, ...])``) and the output has the context
    batch. The composition protocol evaluates cond-A/cond-B/uncond at the
    SAME x_t (clip_eval.py:354,394 runs the same latents under three
    contexts), so everything before the first cross-attention — conv_in,
    the first L0 resnet, and the first 4096-token self-attention, ~14 ms of
    a 182 ms forward at batch 24 — is bitwise-identical across groups;
    running it once and expanding where context first enters
    (TransformerBlock attn2) is exact, not an approximation."""

    config: SDUNetConfig = SDUNetConfig()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, t: Array, context: Array) -> Array:
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        temb = sd_timestep_embedding(
            jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],)), ch0
        )
        temb = nn.Dense(ch0 * 4, dtype=self.dtype, name="time_embed_1")(temb.astype(self.dtype))
        temb = nn.Dense(ch0 * 4, dtype=self.dtype, name="time_embed_2")(nn.swish(temb))
        context = context.astype(self.dtype)

        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        hs = [h]

        # Down path
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            has_attn = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, self.dtype, name=f"down_{i}_res_{j}")(h, temb)
                if has_attn:
                    h = SpatialTransformer(
                        out_ch, cfg.attention_head_dim, cfg.cross_attention_dim,
                        dtype=self.dtype, ffn_impl=cfg.ffn_impl,
                        attn_impl=cfg.attn_impl, name=f"down_{i}_attn_{j}",
                    )(h, context)
                hs.append(h)
            if i != len(cfg.down_block_types) - 1:
                # Explicit symmetric padding: torch/diffusers Downsample2D
                # uses padding=1 on both sides; XLA "SAME" at stride 2 pads
                # (0,1), which would shift activations one pixel vs the
                # checkpoint's training-time alignment.
                h = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"down_{i}_downsample",
                )(h)
                hs.append(h)

        # Mid
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, self.dtype, name="mid_res_0")(h, temb)
        h = SpatialTransformer(
            mid_ch, cfg.attention_head_dim, cfg.cross_attention_dim,
            dtype=self.dtype, ffn_impl=cfg.ffn_impl,
            attn_impl=cfg.attn_impl, name="mid_attn",
        )(h, context)
        h = ResnetBlock2D(mid_ch, self.dtype, name="mid_res_1")(h, temb)

        # Up path
        for i, block_type in enumerate(cfg.up_block_types):
            level = len(cfg.block_out_channels) - 1 - i
            out_ch = cfg.block_out_channels[level]
            has_attn = block_type == "CrossAttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                skip = hs.pop()
                if skip.shape[0] != h.shape[0]:
                    # conditioning dedup: skips recorded before the first
                    # cross-attention carry the deduped batch
                    skip = jnp.tile(skip, (h.shape[0] // skip.shape[0], 1, 1, 1))
                h = ResnetBlock2D(out_ch, self.dtype, name=f"up_{i}_res_{j}")(
                    jnp.concatenate([h, skip], axis=-1), temb
                )
                if has_attn:
                    h = SpatialTransformer(
                        out_ch, cfg.attention_head_dim, cfg.cross_attention_dim,
                        dtype=self.dtype, ffn_impl=cfg.ffn_impl,
                        attn_impl=cfg.attn_impl, name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i != len(cfg.up_block_types) - 1:
                if cfg.upsample_impl == "subpixel":
                    # fused: 2x2x(4*C) conv on the small grid + interleave
                    h = SubpixelUpsample(
                        out_ch, self.dtype, name=f"up_{i}_upsample"
                    )(h)
                else:
                    # nearest-neighbor 2x upsample as repeat: identical
                    # result, cheaper than jax.image.resize's gather
                    # lowering on TPU
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                    h = nn.Conv(
                        out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"up_{i}_upsample",
                    )(h)
        assert not hs

        h = nn.swish(GroupNorm32(name="norm_out")(h))
        h = nn.Conv(cfg.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)
