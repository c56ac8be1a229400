"""NCSNv1/v2 RefineNet layer zoo (CRP/RCU/MSF/RefineBlocks + pool-conv pairs).

Behavioral parity with ``cifar/models/layers.py:117-340`` (itself ported
from the NCSN codebases): the multi-scale RefineNet family used by NCSN
score models, including the noise-conditional variants that thread a class/
noise-level index ``y`` through conditional normalizers
(``ConditionalInstanceNorm2dPlus``, ``normalization.py:106-145``).

Unlike the reference, which keeps conditional and unconditional variants as
separate parallel classes, each family here is ONE stage recipe
(``_crp_stages`` / ``_rcu_stages`` / ``_msf_fuse`` / ``_refine``) shared by
both flavors: the conditional variant is the same recipe with a normalizer
threaded in front of each conv (and CRP's pool switching max->avg, matching
the reference's own v1/v2 split). The public class names and constructor
signatures are kept so reference configs map one-to-one.

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

_RESIZE_METHOD = {"bilinear": "bilinear", "nearest_neighbor": "nearest"}


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


def _normalized(h: Array, normalizer: Optional[Any], y: Optional[Array]) -> Array:
    """Apply the conditional normalizer when one is threaded through; the
    unconditional flavors pass ``normalizer=None`` and share the recipe."""
    return h if normalizer is None else normalizer()(h, y)


def _crp_stages(
    x: Array,
    y: Optional[Array],
    features: int,
    n_stages: int,
    act: Callable,
    normalizer: Optional[Any],
) -> Array:
    """Chained residual pooling trunk (``layers.py:117-153``): ``n_stages``
    pool+conv refinements of a running path, each summed into the trunk.
    Conditional flavor: normalize first and average-pool; unconditional:
    max-pool (the reference's v1/v2 distinction)."""
    pool = nn.avg_pool if normalizer is not None else nn.max_pool
    x = act(x)
    path = x
    for _ in range(n_stages):
        path = _normalized(path, normalizer, y)
        path = pool(path, (5, 5), strides=(1, 1), padding="SAME")
        path = ncsn_conv3x3(path, features, bias=False)
        x = path + x
    return x


def _rcu_stages(
    x: Array,
    y: Optional[Array],
    features: int,
    n_blocks: int,
    n_stages: int,
    act: Callable,
    normalizer: Optional[Any],
) -> Array:
    """Residual conv units (``layers.py:155-192``): ``n_blocks`` residual
    blocks of ``n_stages`` (norm?)-act-conv chains."""
    for _ in range(n_blocks):
        residual = x
        for _ in range(n_stages):
            x = _normalized(x, normalizer, y)
            x = act(x)
            x = ncsn_conv3x3(x, features, bias=False)
        x = x + residual
    return x


def _msf_fuse(
    xs: Sequence[Array],
    y: Optional[Array],
    shape: Sequence[int],
    features: int,
    interpolation: str,
    normalizer: Optional[Any],
) -> Array:
    """Multi-scale fusion (``layers.py:194-235``): (norm?)-conv each scale,
    resize everything to the common ``shape``, sum."""
    method = _RESIZE_METHOD[interpolation]
    total = None
    for x in xs:
        h = _normalized(x, normalizer, y)
        h = ncsn_conv3x3(h, features, bias=True)
        h = jax.image.resize(h, (h.shape[0], *shape, h.shape[-1]), method)
        total = h if total is None else total + h
    return total


class CRPBlock(nn.Module):
    """Chained residual pooling (``layers.py:117-134``)."""

    features: int
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _crp_stages(x, None, self.features, self.n_stages, self.act, None)


class CondCRPBlock(nn.Module):
    """Noise-conditional CRP (``layers.py:136-153``)."""

    features: int
    normalizer: Any
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        return _crp_stages(
            x, y, self.features, self.n_stages, self.act, self.normalizer
        )


class RCUBlock(nn.Module):
    """Residual conv unit (``layers.py:155-172``)."""

    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _rcu_stages(
            x, None, self.features, self.n_blocks, self.n_stages, self.act, None
        )


class CondRCUBlock(nn.Module):
    """Noise-conditional RCU (``layers.py:174-192``)."""

    features: int
    normalizer: Any
    n_blocks: int = 2
    n_stages: int = 2
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        return _rcu_stages(
            x, y, self.features, self.n_blocks, self.n_stages, self.act,
            self.normalizer,
        )


class MSFBlock(nn.Module):
    """Multi-scale fusion (``layers.py:194-212``)."""

    shape: Sequence[int]
    features: int
    interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        return _msf_fuse(
            xs, None, self.shape, self.features, self.interpolation, None
        )


class CondMSFBlock(nn.Module):
    """Noise-conditional MSF (``layers.py:214-235``)."""

    shape: Sequence[int]
    features: int
    normalizer: Any
    interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array) -> Array:
        return _msf_fuse(
            xs, y, self.shape, self.features, self.interpolation, self.normalizer
        )


def _refine(
    xs: Sequence[Array],
    y: Optional[Array],
    output_shape: Sequence[int],
    features: int,
    act: Callable,
    interpolation: str,
    start: bool,
    end: bool,
    normalizer: Optional[Any],
) -> Array:
    """RefineNet block recipe (``layers.py:237-317``): per-scale RCU,
    multi-scale fusion (skipped at the pyramid start), chained pooling,
    then a deeper output RCU at the pyramid end. One recipe serves the
    NCSNv2 (unconditional) and NCSNv1 (conditional) blocks."""
    cond = {"normalizer": normalizer} if normalizer is not None else {}

    def rcu(features: int, n_blocks: int) -> nn.Module:
        cls = CondRCUBlock if normalizer is not None else RCUBlock
        return cls(features=features, n_blocks=n_blocks, n_stages=2, act=act, **cond)

    def call(mod: nn.Module, *args):
        return mod(*args, y) if normalizer is not None else mod(*args)

    hs = [call(rcu(x.shape[-1], n_blocks=2), x) for x in xs]
    if not start:
        msf_cls = CondMSFBlock if normalizer is not None else MSFBlock
        h = call(
            msf_cls(
                shape=output_shape, features=features,
                interpolation=interpolation, **cond,
            ),
            hs,
        )
    else:
        h = hs[0]
    crp_cls = CondCRPBlock if normalizer is not None else CRPBlock
    h = call(crp_cls(features=features, n_stages=2, act=act, **cond), h)
    return call(rcu(features, n_blocks=3 if end else 1), h)


class RefineBlock(nn.Module):
    """RefineNet block for NCSNv2 (``layers.py:237-273``)."""

    output_shape: Sequence[int]
    features: int
    act: Callable = nn.relu
    interpolation: str = "bilinear"
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        return _refine(
            xs, None, self.output_shape, self.features, self.act,
            self.interpolation, self.start, self.end, None,
        )


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
        return _refine(
            xs, y, self.output_shape, self.features, self.act,
            self.interpolation, self.start, self.end, self.normalizer,
        )


def _mean_pool_2x2(x: Array) -> Array:
    """2x2 stride-2 mean pool as the reference writes it — the average of
    the four phase-shifted stride-2 slices (``layers.py:330-336``)."""
    return (
        x[:, ::2, ::2, :] + x[:, 1::2, ::2, :]
        + x[:, ::2, 1::2, :] + x[:, 1::2, 1::2, :]
    ) / 4.0


class _PoolConvPair(nn.Module):
    """Shared body of the conv/mean-pool pairs (``layers.py:319-358``);
    ``pool_first`` selects the composition order."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True
    pool_first: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.pool_first:
            x = _mean_pool_2x2(x)
        x = nn.Conv(
            self.output_dim,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(1, 1),
            padding="SAME",
            use_bias=self.biases,
        )(x)
        return x if self.pool_first else _mean_pool_2x2(x)


class ConvMeanPool(_PoolConvPair):
    """Conv then 2x2 mean-pool (``layers.py:319-338``)."""

    pool_first: bool = False


class MeanPoolConv(_PoolConvPair):
    """2x2 mean-pool then conv (``layers.py:340-358``)."""

    pool_first: bool = True
