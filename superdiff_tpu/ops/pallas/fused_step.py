"""Fused SuperDiff SDE step epilogue — Pallas TPU kernel.

After the N score-network forwards, the reference performs ~N+6 separate
elementwise/reduction passes over the latent per step (weights, mixing, EM
update, N squared-score reductions, renorm — ``cifar/dynamics.py:115-136``).
These are bandwidth-bound; this kernel performs them in ONE pass over HBM:

  inputs  : sscores (N,B,D), x (B,D), eps (B,D), logq (B,N), scalars
  outputs : new_x (B,D), new_logq (B,N)

computing, per batch row,
  w        = softmax(T * logq)                     (OR weights)
  balanced = sum_n w_n * s_n
  dx       = -dt (da x - 2 beta balanced) + sqrt(2 sigma beta dt) eps
  dlogq_n  = sum_D (da(x+dx) - v_n)(dt v_n + 2 dx + da dt (x+dx)) / (4 sigma beta)
  new_logq = renormalize(logq + dlogq)

The grid tiles the batch; each program holds its (N, BB, D) score block in
VMEM (CIFAR: N=2, D=3072 -> 48 KB fp32). Numerics match the jnp reference
path bit-for-bit in fp32 (asserted by tests/test_pallas.py); ``fused_sde_step``
falls back to the jnp path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(scale_ref, s_ref, x_ref, eps_ref, logq_ref, newx_ref, newlogq_ref, *, n_models, temperature):
    # scalars prefetched in SMEM: [da, beta, sigma, dt]
    da = scale_ref[0]
    beta = scale_ref[1]
    sigma = scale_ref[2]
    dt = scale_ref[3]

    x = x_ref[:]  # (BB, D)
    eps = eps_ref[:]
    logq = logq_ref[:]  # (BB, N)

    # OR weights: softmax along the model axis (small N, fp32 in VMEM)
    m = jnp.max(logq, axis=-1, keepdims=True)
    ew = jnp.exp(temperature * (logq - m))
    w = ew / jnp.sum(ew, axis=-1, keepdims=True)  # (BB, N)

    balanced = jnp.zeros_like(x)
    for n in range(n_models):
        balanced = balanced + w[:, n : n + 1] * s_ref[n]

    dx = -dt * (da * x - 2.0 * beta * balanced) + jnp.sqrt(2.0 * sigma * beta * dt) * eps
    newx_ref[:] = x + dx

    f_next = da * (x + dx)
    inv = 1.0 / (4.0 * sigma * beta)
    for n in range(n_models):
        v = da * x - 2.0 * beta * s_ref[n]
        num = (f_next - v) * (dt * v + 2.0 * dx + dt * f_next)
        newlogq_ref[:, n : n + 1] = (
            logq[:, n : n + 1] + jnp.sum(num, axis=-1, keepdims=True) * inv
        )
    # max-renormalization (dynamics.py:135)
    mx = jnp.max(newlogq_ref[:], axis=-1, keepdims=True)
    newlogq_ref[:] = newlogq_ref[:] - mx


def fused_sde_step_pallas(
    sscores: Array,  # (N, B, D) fp32
    x: Array,  # (B, D)
    eps: Array,  # (B, D)
    logq: Array,  # (B, N)
    da: Array,
    beta: Array,
    sigma: Array,
    dt: Array,
    *,
    temperature: float = 1e6,
    block_b: int = 8,
    interpret: bool = False,
):
    n_models, b, d = sscores.shape
    # TPU tiling: sublane block dim must be divisible by 8 or equal b.
    bb = max(block_b, 8)
    if b % bb or bb % 8:
        bb = b
    scalars = jnp.stack([da, beta, sigma, dt]).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((n_models, bb, d), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n_models), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n_models), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_kernel, n_models=n_models, temperature=temperature)
    new_x, new_logq = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n_models), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, sscores.astype(jnp.float32), x.astype(jnp.float32),
      eps.astype(jnp.float32), logq.astype(jnp.float32))
    return new_x, new_logq


def fused_sde_step_reference(sscores, x, eps, logq, da, beta, sigma, dt, *, temperature=1e6):
    """jnp reference path (identical math, for CPU fallback + testing)."""
    w = jax.nn.softmax(temperature * logq, axis=-1)  # (B, N)
    balanced = jnp.einsum("bn,nbd->bd", w, sscores)
    dx = -dt * (da * x - 2.0 * beta * balanced) + jnp.sqrt(2.0 * sigma * beta * dt) * eps
    v = da * x[None] - 2.0 * beta * sscores
    f_next = da * (x + dx)[None]
    num = (f_next - v) * (dt * v + 2.0 * dx[None] + dt * f_next)
    dlogq = num.sum(-1).T / (4.0 * sigma * beta)
    new_logq = logq + dlogq
    new_logq = new_logq - new_logq.max(axis=-1, keepdims=True)
    return x + dx, new_logq


def fused_sde_step(sscores, x, eps, logq, da, beta, sigma, dt, *, temperature=1e6):
    """Dispatch: Pallas on TPU, jnp elsewhere. Latent is flattened to (B, D)."""
    orig_shape = x.shape
    b = x.shape[0]
    d = x.size // b
    s2 = sscores.reshape(sscores.shape[0], b, d)
    x2, e2 = x.reshape(b, d), eps.reshape(b, d)
    if jax.default_backend() == "tpu" and d % 128 == 0:
        new_x, new_logq = fused_sde_step_pallas(s2, x2, e2, logq, da, beta, sigma, dt, temperature=temperature)
    else:
        new_x, new_logq = fused_sde_step_reference(s2, x2, e2, logq, da, beta, sigma, dt, temperature=temperature)
    return new_x.reshape(orig_shape), new_logq
