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
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        h = (xf - means[:, None, None, :]) / jnp.sqrt(var + 1e-5)
        c = x.shape[-1]

        def scale_init(key, shape, dtype=jnp.float32):
            return nn.initializers.normal(0.02)(key, shape, dtype) + 1.0

        # composition order per normalization.py:96-100: the re-injected
        # color statistic is added BEFORE the gamma scaling
        alpha = self.param("alpha", scale_init, (1, 1, 1, c))
        gamma = self.param("gamma", scale_init, (1, 1, 1, c))
        h = h + means_norm[:, None, None, :] * alpha
        h = h * gamma
        if self.bias:
            h = h + self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        return h.astype(x.dtype)


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Conditional InstanceNorm++ (NCSNv1): per-class embedded
    (gamma, alpha[, beta]) modulate the InstanceNorm++ statistics
    (``cifar/models/normalization.py:106-145``). ``y`` is an integer class /
    noise-level index of shape (B,)."""

    num_classes: int = 10
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        xf = x.astype(jnp.float32)
        means = jnp.mean(xf, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_plus = (means - m) / jnp.sqrt(v + 1e-5)
        h = (xf - means[:, None, None, :]) / jnp.sqrt(
            jnp.var(xf, axis=(1, 2), keepdims=True) + 1e-5
        )
        c = x.shape[-1]
        n_feat = 3 * c if self.bias else 2 * c

        def init_embed(key, shape, dtype=jnp.float32):
            # gamma/alpha start near 1, beta near 0 (normalization.py:110-134)
            normal = nn.initializers.normal(0.02)(key, (shape[0], 2 * c), dtype) + 1.0
            if not self.bias:
                return normal
            return jnp.concatenate([normal, jnp.zeros((shape[0], c), dtype)], -1)

        embed = nn.Embed(self.num_classes, n_feat, embedding_init=init_embed)(y)
        if self.bias:
            gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
        else:
            gamma, alpha = jnp.split(embed, 2, axis=-1)
            beta = None
        h = h + means_plus[:, None, None, :] * alpha[:, None, None, :]
        out = gamma[:, None, None, :] * h
        if beta is not None:
            out = out + beta[:, None, None, :]
        return out.astype(x.dtype)


def get_normalization(
    name: str = "GroupNorm", conditional: bool = False, num_classes: int = 10
) -> Callable:
    """Selector mirroring ``normalization.py:23-41``. Conditional variants
    take (x, y-index) and modulate scale/shift from an embedded condition;
    as in the reference, only InstanceNorm++ has a conditional form."""
    table = {
        "GroupNorm": GroupNorm32,
        "VarianceNorm": VarianceNorm2d,
        "InstanceNorm": InstanceNorm2d,
        "InstanceNorm++": InstanceNorm2dPlus,
    }
    if name not in table:
        raise ValueError(f"unknown normalization: {name}")
    if conditional:
        if name == "InstanceNorm++":
            import functools

            return functools.partial(
                ConditionalInstanceNorm2dPlus, num_classes=num_classes
            )
        raise NotImplementedError(f"{name} has no conditional variant")
    return table[name]
