"""Fused sigma-space OR-composition step epilogue — Pallas TPU kernel.

The Stable-Diffusion counterpart of ``fused_step.py``: after the batched
UNet forward produces the three velocities, one kernel computes the OR
kappa from the running log-likelihoods, the CFG-mixed field, the EM update,
and both models' divergence-free Itô increments in a single pass over HBM
(``applications/images/clip_eval.py:394-413`` math):

  kappa    = softmax([T (ll_obj + logp), T ll_bg])[0]
  vf       = v_unc + g ((v_bg - v_unc) + kappa (v_obj - v_bg))
  dx       = 2 dsigma vf + sqrt(2 |dsigma| sigma) eps
  dll_i    = -sum(v_i (dx + dsigma v_i)) / sigma          (i = obj, bg)

SD latents at 512px are (B, 16384) fp32 rows — 6 latent-sized tensors stream
through VMEM once instead of the ~8 passes the unfused lowering takes.
Numerics match the jnp path (tests/test_pallas.py); callers fall back to jnp
off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(scale_ref, vo_ref, vb_ref, vu_ref, x_ref, eps_ref, ll_ref,
            newx_ref, newll_ref, kappa_ref, *, temperature, logp, guidance):
    sigma = scale_ref[0]
    dsigma = scale_ref[1]

    v_obj = vo_ref[:]  # (BB, D)
    v_bg = vb_ref[:]
    v_unc = vu_ref[:]
    x = x_ref[:]
    eps = eps_ref[:]
    ll = ll_ref[:]  # (BB, 2): [ll_obj, ll_bg]

    a = temperature * (ll[:, 0:1] + logp)
    b = temperature * ll[:, 1:2]
    m = jnp.maximum(a, b)
    ea = jnp.exp(a - m)
    eb = jnp.exp(b - m)
    kappa = ea / (ea + eb)  # (BB, 1)
    kappa_ref[:] = kappa

    vf = v_unc + guidance * ((v_bg - v_unc) + kappa * (v_obj - v_bg))
    dx = 2.0 * dsigma * vf + jnp.sqrt(2.0 * jnp.abs(dsigma) * sigma) * eps
    newx_ref[:] = x + dx

    dll_obj = -jnp.sum(v_obj * (dx + dsigma * v_obj), axis=-1, keepdims=True) / sigma
    dll_bg = -jnp.sum(v_bg * (dx + dsigma * v_bg), axis=-1, keepdims=True) / sigma
    newll_ref[:, 0:1] = ll[:, 0:1] + dll_obj
    newll_ref[:, 1:2] = ll[:, 1:2] + dll_bg


def sd_or_step_pallas(
    v_obj: Array, v_bg: Array, v_unc: Array,  # (B, D) fp32
    x: Array, eps: Array,  # (B, D)
    ll: Array,  # (B, 2) fp32
    sigma: Array, dsigma: Array,
    *,
    temperature: float = 1.0,
    logp: float = 0.0,
    guidance: float = 7.5,
    block_b: int = 4,
    interpret: bool = False,
):
    b, d = x.shape
    # TPU tiling: the sublane block dim must be divisible by 8 or span the
    # whole array; fall back to one full-batch block otherwise.
    bb = max(block_b, 8)
    if b % bb or bb % 8:
        bb = b
    scalars = jnp.stack([sigma, dsigma]).astype(jnp.float32)
    lat = lambda: pl.BlockSpec((bb, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    small = lambda w: pl.BlockSpec((bb, w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[lat(), lat(), lat(), lat(), lat(), small(2)],
        out_specs=[lat(), small(2), small(1)],
    )
    kernel = functools.partial(
        _kernel, temperature=temperature, logp=logp, guidance=guidance
    )
    f32 = lambda a: a.astype(jnp.float32)
    new_x, new_ll, kappa = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, f32(v_obj), f32(v_bg), f32(v_unc), f32(x), f32(eps), f32(ll))
    return new_x, new_ll, kappa[:, 0]


def sd_or_step_reference(
    v_obj, v_bg, v_unc, x, eps, ll, sigma, dsigma,
    *, temperature=1.0, logp=0.0, guidance=7.5,
):
    """jnp path with identical math (CPU fallback + test oracle)."""
    a = temperature * (ll[:, 0] + logp)
    b = temperature * ll[:, 1]
    m = jnp.maximum(a, b)
    kappa = jnp.exp(a - m) / (jnp.exp(a - m) + jnp.exp(b - m))
    vf = v_unc + guidance * ((v_bg - v_unc) + kappa[:, None] * (v_obj - v_bg))
    dx = 2.0 * dsigma * vf + jnp.sqrt(2.0 * jnp.abs(dsigma) * sigma) * eps
    dll_obj = -jnp.sum(v_obj * (dx + dsigma * v_obj), axis=-1) / sigma
    dll_bg = -jnp.sum(v_bg * (dx + dsigma * v_bg), axis=-1) / sigma
    new_ll = jnp.stack([ll[:, 0] + dll_obj, ll[:, 1] + dll_bg], axis=-1)
    return x + dx, new_ll, kappa
