"""DDPM-style UNet score network, TPU-first Flax implementation.

Same capability as the reference's ``ScoreNet`` (``cifar/models/ddpm.py:41-101``
plus its layer zoo ``cifar/models/layers.py``), re-designed rather than
translated:

* NHWC layout end-to-end (XLA's native TPU conv layout — no transposes).
* Optional bf16 compute with fp32 parameters and fp32 GroupNorm/attention
  softmax: matmuls/convs hit the MXU at bf16 throughput, normalization and
  logits stay accurate.
* Attention as a single einsum pair — differentiable under ``jax.jvp``
  (needed by the ODE Itô estimator; the reference had to disable flash
  attention for this, ``applications/images/clip_eval.py:97``).
* Static Python structure (channel lists resolved at trace time) so the
  whole net compiles to one fused XLA computation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def timestep_embedding(t: Array, dim: int, max_period: float = 10_000.0) -> Array:
    """Sinusoidal timestep embedding (DDPM convention).

    ``t`` may be continuous in [0, 1] (scaled by 1000, as VP-SDE codebases do)
    or an integer grid; callers pre-scale. Returns (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32).reshape(-1, 1) * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class _ScaleBias(nn.Module):
    """Parameter container matching nn.GroupNorm's (scale, bias) layout so
    checkpoint paths stay ``.../GroupNorm_0/{scale,bias}``."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return g, b


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics, applied in the activation dtype.

    Statistics (mean/var per group) are accumulated in fp32 for stability,
    then folded into per-(batch, channel) scale/shift applied as one
    ``x * a + b`` in the original dtype — a single fusable elementwise pass
    instead of upcasting the whole activation to fp32 (which doubles HBM
    traffic and blocks fusion into the following conv). Matches
    ``nn.GroupNorm(dtype=f32)`` to bf16 rounding; exact in fp32.
    """

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:  # largest divisor <= num_groups
            groups -= 1
        g, b = _ScaleBias(c, name="GroupNorm_0")()
        bsz = x.shape[0]
        xg = x.astype(jnp.float32).reshape(bsz, -1, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 3))  # (B, G) fp32
        # Fast variance E[x^2]-E[x]^2 can go negative via catastrophic
        # cancellation (large mean, tiny spread) — clamp like flax's
        # _compute_stats does, else rsqrt returns NaN (jit fusion changes
        # the rounding, so the blowup is compile-dependent).
        var = jnp.maximum(
            jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean), 0.0
        )
        rstd = jax.lax.rsqrt(var + self.eps)
        per_ch = c // groups
        mean_c = jnp.repeat(mean, per_ch, axis=-1)  # (B, C)
        rstd_c = jnp.repeat(rstd, per_ch, axis=-1)
        a = rstd_c * g
        bb = b - mean_c * a
        bshape = (bsz,) + (1,) * (x.ndim - 2) + (c,)
        return x * a.reshape(bshape).astype(x.dtype) + bb.reshape(bshape).astype(x.dtype)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array, train: bool) -> Array:
        # eps 1e-6: the reference ScoreNet uses flax nn.GroupNorm defaults
        # (cifar/models/normalization.py:39 -> nn.GroupNorm, epsilon=1e-6);
        # parity-tested in tests/test_cifar_unet_parity.py. The SD UNet keeps
        # the diffusers convention (1e-5) via GroupNorm32's default.
        h = nn.swish(GroupNorm32(eps=1e-6)(x))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = h + nn.Dense(self.out_ch, dtype=self.dtype)(nn.swish(temb))[:, None, None, :]
        h = nn.swish(GroupNorm32(eps=1e-6)(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(
            self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
        )(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Dense(self.out_ch, dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Self-attention over spatial positions; fp32 softmax, jvp-friendly."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, hh, ww, c = x.shape
        h = GroupNorm32(eps=1e-6)(x)
        q = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        k = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        v = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c**-0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros)(out)
        return x + out


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.with_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return x


class ScoreUNet(nn.Module):
    """UNet predicting the sigma-scaled score (``-eps_hat`` convention).

    Call signature mirrors the reference oracle: ``(t, x, y, train)`` with
    ``t`` broadcastable to (B, 1, 1, 1), ``x`` NHWC, optional integer labels.
    """

    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16, 8)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    num_classes: Optional[int] = None  # set to enable class conditioning
    dtype: jnp.dtype = jnp.float32  # compute dtype; params stay fp32

    @nn.compact
    def __call__(self, t: Array, x: Array, y: Optional[Array] = None, train: bool = False) -> Array:
        nf, dtype = self.nf, self.dtype
        num_res = len(self.ch_mult)

        temb = timestep_embedding(t.reshape(-1), nf)
        temb = nn.Dense(nf * 4, dtype=dtype)(temb.astype(dtype))
        temb = nn.Dense(nf * 4, dtype=dtype)(nn.swish(temb))
        if self.num_classes is not None:
            assert y is not None, "conditioned model requires labels"
            temb = temb + nn.Embed(self.num_classes, nf * 4, dtype=dtype)(y.astype(jnp.int32))

        h = nn.Conv(nf, (3, 3), padding="SAME", dtype=dtype)(x.astype(dtype))
        hs = [h]
        for level in range(num_res):
            for _ in range(self.num_res_blocks):
                h = ResnetBlock(nf * self.ch_mult[level], self.dropout, dtype)(hs[-1], temb, train)
                if h.shape[1] in self.attn_resolutions:
                    h = AttnBlock(dtype)(h)
                hs.append(h)
            if level != num_res - 1:
                hs.append(Downsample(self.resamp_with_conv, dtype)(hs[-1]))

        h = hs[-1]
        h = ResnetBlock(h.shape[-1], self.dropout, dtype)(h, temb, train)
        h = AttnBlock(dtype)(h)
        h = ResnetBlock(h.shape[-1], self.dropout, dtype)(h, temb, train)

        for level in reversed(range(num_res)):
            for _ in range(self.num_res_blocks + 1):
                h = ResnetBlock(nf * self.ch_mult[level], self.dropout, dtype)(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train
                )
            if h.shape[1] in self.attn_resolutions:
                h = AttnBlock(dtype)(h)
            if level != 0:
                h = Upsample(self.resamp_with_conv, dtype)(h)
        assert not hs

        h = nn.swish(GroupNorm32(eps=1e-6)(h))
        h = nn.Conv(
            x.shape[-1], (3, 3), padding="SAME", dtype=dtype,
            kernel_init=nn.initializers.zeros,
        )(h)
        return h.astype(jnp.float32)
