"""NCSNv1/v2 RefineNet layer zoo (CRP/RCU/MSF/RefineBlocks + pool-conv pairs).

Behavioral parity with ``cifar/models/layers.py:117-340`` (itself ported
from the NCSN codebases): the multi-scale RefineNet family used by NCSN
score models, including the noise-conditional variants that thread a class/
noise-level index ``y`` through conditional normalizers
(``ConditionalInstanceNorm2dPlus``, ``normalization.py:106-145``).

The SuperDiff composed configs use the DDPM UNet, so these blocks are
config-compatible inventory rather than the hot path; they are still
TPU-clean — NHWC, static shapes, ``jax.image.resize`` for multi-scale
fusion, fp32 normalization statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def ncsn_conv3x3(
    x: Array, features: int, stride: int = 1, bias: bool = True,
    dilation: int = 1, init_scale: float = 1.0,
) -> Array:
    """3x3 conv with NCSN's torch-style init (``layers.py:77-93``):
    variance_scaling(1/3·scale, fan_in, uniform) for the kernel, and the
    bias drawn from the same distribution (the reference samples it as one
    row of a kernel-shaped draw)."""
    init_scale = 1e-10 if init_scale == 0 else init_scale
    kernel_init = nn.initializers.variance_scaling(
        init_scale / 3.0, "fan_in", "uniform"
    )
    kernel_shape = (3, 3, x.shape[-1], features)
    bias_init = lambda key, shape, dtype=jnp.float32: kernel_init(
        key, kernel_shape, dtype
    )[0, 0, 0, :]
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding="SAME",
        use_bias=bias,
        kernel_dilation=(dilation, dilation),
        kernel_init=kernel_init,
        bias_init=bias_init,
    )(x)


class CRPBlock(nn.Module):
    """Chained residual pooling (``layers.py:117-134``): repeated 5x5
    max-pool + 3x3 conv paths summed into the trunk."""

    features: int
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = nn.max_pool(path, (5, 5), strides=(1, 1), padding="SAME")
            path = ncsn_conv3x3(path, self.features, bias=False)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Noise-conditional CRP (``layers.py:136-153``): normalizer(x, y) before
    each stage, avg-pool instead of max."""

    features: int
    normalizer: Any
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = self.normalizer()(path, y)
            path = nn.avg_pool(path, (5, 5), strides=(1, 1), padding="SAME")
            path = ncsn_conv3x3(path, self.features, bias=False)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (``layers.py:155-172``)."""

    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv3x3(x, self.features, bias=False)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """Noise-conditional RCU (``layers.py:174-192``)."""

    features: int
    normalizer: Any
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.normalizer()(x, y)
                x = self.act(x)
                x = ncsn_conv3x3(x, self.features, bias=False)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion (``layers.py:194-212``): conv each input, resize to
    a common shape, sum."""

    shape: Sequence[int]
    features: int
    interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        assert self.interpolation in ("bilinear", "nearest_neighbor")
        method = "bilinear" if self.interpolation == "bilinear" else "nearest"
        total = None
        for x in xs:
            h = ncsn_conv3x3(x, self.features, bias=True)
            h = jax.image.resize(
                h, (h.shape[0], *self.shape, h.shape[-1]), method
            )
            total = h if total is None else total + h
        return total


class CondMSFBlock(nn.Module):
    """Noise-conditional MSF (``layers.py:214-235``)."""

    shape: Sequence[int]
    features: int
    normalizer: Any
    interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array) -> Array:
        method = "bilinear" if self.interpolation == "bilinear" else "nearest"
        total = None
        for x in xs:
            h = self.normalizer()(x, y)
            h = ncsn_conv3x3(h, self.features, bias=True)
            h = jax.image.resize(
                h, (h.shape[0], *self.shape, h.shape[-1]), method
            )
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block for NCSNv2 (``layers.py:237-273``): per-input RCU,
    multi-scale fusion, chained pooling, output RCU."""

    output_shape: Sequence[int]
    features: int
    act: Callable = nn.relu
    interpolation: str = "bilinear"
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        hs = [
            RCUBlock(features=x.shape[-1], n_blocks=2, n_stages=2, act=self.act)(x)
            for x in xs
        ]
        if not self.start:
            h = MSFBlock(
                shape=self.output_shape,
                features=self.features,
                interpolation=self.interpolation,
            )(hs)
        else:
            h = hs[0]
        h = CRPBlock(features=self.features, n_stages=2, act=self.act)(h)
        return RCUBlock(
            features=self.features,
            n_blocks=3 if self.end else 1,
            n_stages=2,
            act=self.act,
        )(h)


class CondRefineBlock(nn.Module):
    """Noise-conditional RefineNet block for NCSNv1 (``layers.py:275-317``)."""

    output_shape: Sequence[int]
    features: int
    normalizer: Any
    act: Callable = nn.relu
    interpolation: str = "bilinear"
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array) -> Array:
        hs = [
            CondRCUBlock(
                features=x.shape[-1], n_blocks=2, n_stages=2,
                act=self.act, normalizer=self.normalizer,
            )(x, y)
            for x in xs
        ]
        if not self.start:
            h = CondMSFBlock(
                shape=self.output_shape,
                features=self.features,
                interpolation=self.interpolation,
                normalizer=self.normalizer,
            )(hs, y)
        else:
            h = hs[0]
        h = CondCRPBlock(
            features=self.features, n_stages=2, act=self.act,
            normalizer=self.normalizer,
        )(h, y)
        return CondRCUBlock(
            features=self.features,
            n_blocks=3 if self.end else 1,
            n_stages=2,
            act=self.act,
            normalizer=self.normalizer,
        )(h, y)


class ConvMeanPool(nn.Module):
    """Conv then 2x2 mean-pool (``layers.py:319-338``)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(
            self.output_dim,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(1, 1),
            padding="SAME",
            use_bias=self.biases,
        )(x)
        return (
            h[:, ::2, ::2, :] + h[:, 1::2, ::2, :]
            + h[:, ::2, 1::2, :] + h[:, 1::2, 1::2, :]
        ) / 4.0


class MeanPoolConv(nn.Module):
    """2x2 mean-pool then conv (``layers.py:340-358``)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = (
            x[:, ::2, ::2, :] + x[:, 1::2, ::2, :]
            + x[:, ::2, 1::2, :] + x[:, 1::2, 1::2, :]
        ) / 4.0
        return nn.Conv(
            self.output_dim,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(1, 1),
            padding="SAME",
            use_bias=self.biases,
        )(h)
