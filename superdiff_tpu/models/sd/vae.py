"""SD AutoencoderKL (decoder + encoder), Flax, TPU-first.

Equivalent of the diffusers ``AutoencoderKL`` the reference uses to decode
latents (``applications/images/clip_eval.py:29,47``). The sampler only needs
``decode`` (latents/scale -> image in [-1,1]); ``encode`` is provided for
completeness (image-space likelihood comparisons). NHWC, bf16 compute.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..unet import GroupNorm32

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215  # SD-1.x latent scale

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(base_channels=32, channel_mults=(1, 2), layers_per_block=1)


class VAEResnet(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.swish(GroupNorm32(eps=1e-6, name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.swish(GroupNorm32(eps=1e-6, name="norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class VAEAttn(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        z = GroupNorm32(eps=1e-6, name="norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(z)
        k = nn.Dense(c, dtype=self.dtype, name="k")(z)
        v = nn.Dense(c, dtype=self.dtype, name="v")(z)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c**-0.5)
        attn = jax.nn.softmax(logits, -1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out).reshape(b, h, w, c)
        return x + out


class VAEDecoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    out_channels: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        chs = [cfg.base_channels * m for m in cfg.channel_mults]
        z = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )(z.astype(self.dtype))
        h = nn.Conv(chs[-1], (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        h = VAEResnet(chs[-1], self.dtype, name="mid_res_0")(h)
        h = VAEAttn(self.dtype, name="mid_attn")(h)
        h = VAEResnet(chs[-1], self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(reversed(chs)):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, self.dtype, name=f"up_{i}_res_{j}")(h)
            if i != len(chs) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(h.shape[-1], (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"up_{i}_conv")(h)
        h = nn.swish(GroupNorm32(eps=1e-6, name="norm_out")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


class VAEEncoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """Returns (mean, logvar) concatenated: (B, H/8, W/8, 2*latent)."""
        cfg = self.cfg
        chs = [cfg.base_channels * m for m in cfg.channel_mults]
        h = nn.Conv(chs[0], (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        for i, ch in enumerate(chs):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, self.dtype, name=f"down_{i}_res_{j}")(h)
            if i != len(chs) - 1:
                # NOTE: unlike the UNet's Downsample2D (symmetric padding=1),
                # the diffusers VAE Encoder builds its down blocks with
                # downsample_padding=0 and pads manually with F.pad(0,1,0,1)
                # — i.e. asymmetric (lo=0, hi=1), which is exactly XLA's
                # "SAME" for stride 2 on even inputs. Keep SAME here.
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                            dtype=self.dtype, name=f"down_{i}_conv")(h)
        h = VAEResnet(chs[-1], self.dtype, name="mid_res_0")(h)
        h = VAEAttn(self.dtype, name="mid_attn")(h)
        h = VAEResnet(chs[-1], self.dtype, name="mid_res_1")(h)
        h = nn.swish(GroupNorm32(eps=1e-6, name="norm_out")(h))
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(h)
        return h.astype(jnp.float32)


def decode_to_uint8(decoder, params, latents: Array, scaling_factor: float) -> Array:
    """latents -> uint8 images, matching ``clip_eval.py:46-60`` semantics."""
    img = decoder.apply({"params": params}, latents / scaling_factor)
    img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
    return (img * 255.0).astype(jnp.uint8)
