"""Fused LayerNorm + GEGLU feed-forward + residual — Pallas TPU kernel.

Why this exists: the SD-1.x transformer FFN sub-block is
``x + ff_out(v * gelu(g))`` with ``(v, g) = split(LN(x) @ W1, 2)``. The XLA
lowering runs the two matmuls at ~90% MFU (measured: the kernels are not the
win), but everything around them round-trips HBM: the pre-LayerNorm
materializes an fp32 copy of the (M, C) stream, its bf16 recast is a
separate kernel, the (M, 8C) projection and (M, 4C) gated intermediate each
cross HBM, and the residual add is one more pass. This kernel does the whole
sub-block with ONE HBM read of x and ONE write of the output: each (bm, C)
row block is LayerNorm-ed in fp32 into VMEM scratch once, the value/gate
tiles and the gated second matmul accumulate over hidden-dim tiles in VMEM,
and the residual is re-read from the still-resident x block at the end.

A/B trace at batch 24 (v5e, 10-iter scan): the matmul-only variant measured
a wash vs XLA (21.6 ms of Pallas kernels replacing ~22 ms of XLA fusions,
plus ~2 ms of new cast/add glue); the LN+residual fusion removes that glue
and the fp32 LN round-trip.

Reference behavior target: the diffusers ``BasicTransformerBlock`` norm3 +
``FeedForward(GEGLU)`` inside the UNet the reference drives
(``applications/images/clip_eval.py:29-43``, model
``CompVis/stable-diffusion-v1-4``); the composition ODE jvp's through the
UNet, so forward-mode routes through the plain einsum path (same pattern as
``flash_attention.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gelu(x: Array, approximate: bool) -> Array:
    return jax.nn.gelu(x, approximate=approximate)


# Degree-14 Chebyshev-fit of p where Phi(x) - 1/2 = x * p(x^2) on |x| <= 5.5
# (Phi = standard normal CDF), evaluated as a power-basis Horner in the
# remapped variable n = x^2 * (2/5.5^2) - 1 in [-1, 1]. Max fp32 gelu error
# 1.2e-6 on [-7.5, 7.5] (clamp handles the tails: q(+-5.5) = +-1/2 to 1e-8).
_GELU_P_COEF = (
    1.285519294e-01, -6.417257621e-02, 4.773779589e-02, -3.878402957e-02,
    3.206722320e-02, -2.614160622e-02, 2.038480692e-02, -1.456035862e-02,
    1.016421201e-02, -7.878193782e-03, 4.723569624e-03, -1.051773090e-03,
    6.399065034e-04, -1.428040806e-03, 6.562366469e-04)
_GELU_P_SCALE = 2.0 / (5.5 * 5.5)


def _gelu_kernel(x: Array, approximate: bool) -> Array:
    """gelu flavor usable inside the Mosaic-lowered kernel body.

    The tanh approximation lowers natively. The exact-erf flavor cannot:
    Mosaic has no lowering for ``lax.erf_p``/``erfc_p`` (jax.nn.gelu's exact
    branch uses erfc and fails to compile inside a TPU Pallas kernel), so it
    substitutes an FMA-only odd minimax polynomial for Phi(x) - 1/2 — no
    transcendentals at all (the previous A&S rational-exp erf cost a
    measured +3.55 ms/forward in exp+div VPU time). Max abs gelu error
    1.2e-6 in fp32 — an order below the 2e-5 kernel-vs-einsum test tolerance
    and far below the bf16 output quantization, so the fused path stays
    numerically interchangeable with the XLA exact-erf path
    (``tests/test_pallas.py`` asserts this in both interpret and compiled
    modes)."""
    if approximate:
        return jax.nn.gelu(x, approximate=True)
    xc = jnp.clip(x, -5.5, 5.5)
    n = xc * xc * jnp.float32(_GELU_P_SCALE) - 1.0
    p = jnp.float32(_GELU_P_COEF[-1])
    for c in _GELU_P_COEF[-2::-1]:
        p = p * n + jnp.float32(c)
    return x * (0.5 + xc * p)


def _layernorm(x32: Array, gamma: Array, beta: Array, eps: float) -> Array:
    """Row LayerNorm in fp32, flax fast-variance convention."""
    mu = x32.mean(-1, keepdims=True)
    var = jnp.maximum((x32 * x32).mean(-1, keepdims=True) - mu * mu, 0.0)
    xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return xn * gamma + beta


def _reference(x, w1, b1, w2, b2, approximate):
    h = (x.astype(w1.dtype) @ w1) + b1.astype(w1.dtype)
    v, g = jnp.split(h, 2, axis=-1)
    h = v * _gelu(g.astype(jnp.float32), approximate).astype(h.dtype)
    return (h @ w2) + b2.astype(w2.dtype)


def _reference_block(x, gamma, beta, w1, b1, w2, b2, eps, approximate):
    xn = _layernorm(x.astype(jnp.float32), gamma, beta, eps)
    return x + _reference(xn.astype(w1.dtype), w1, b1, w2, b2,
                          approximate).astype(x.dtype)


# Number of independent row-chain splits inside one FFN kernel program.
# 1 = single chain. 2 = split the row block into halves whose
# matmul->gelu->matmul chains carry no data dependency, giving Mosaic's
# scheduler the slack to overlap one half's gelu (VPU) with the other
# half's matmuls (MXU) — inside a single chain the units strictly
# serialize, so every VPU pass is added latency. Module-level so
# scripts/bench_ffn_pipe.py can A/B it on the chip. On-chip sweep
# (BENCH_DETAIL ffn_pipe_sweep, B24 production shapes): pipe2 4.79 vs
# 4.92 ms (L0) and 3.95 vs 3.96 (L1); pipe4 regresses — 2 is default.
_PIPE = 2


def _kernel(x_ref, g_ref, be_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref,
            w2_ref, b2_ref, o_ref, acc_ref, xn_ref, *, n_f, approximate,
            eps, fuse_ln, fuse_residual, pipe):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if fuse_ln:
            x32 = x_ref[:].astype(jnp.float32)
            xn_ref[:] = _layernorm(
                x32, g_ref[0, :][None, :], be_ref[0, :][None, :], eps
            ).astype(xn_ref.dtype)
        else:
            xn_ref[:] = x_ref[:]

    bm = xn_ref.shape[0]
    step = bm // pipe
    for c0 in range(0, bm, step):
        sl = slice(c0, c0 + step)
        xn = xn_ref[sl, :]  # (bm/pipe, C) bf16
        v = jax.lax.dot_general(
            xn, w1v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1v_ref[0, :][None, :]
        g = jax.lax.dot_general(
            xn, w1g_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1g_ref[0, :][None, :]
        h = (v * _gelu_kernel(g, approximate)).astype(xn.dtype)
        acc_ref[sl, :] += jax.lax.dot_general(
            h, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_f - 1)
    def _fin():
        out = acc_ref[:] + b2_ref[0, :][None, :]
        if fuse_residual:
            out = out + x_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


def _pick_blocks(m, c, f):
    """Row/hidden tile sizes under the ~16 MB VMEM budget (weights tiles
    double-buffered by the pipeline; the fp32 (bm, bf) value/gate
    intermediates are the dominant term). Overridable for on-chip sweeps
    via SUPERDIFF_GEGLU_BLOCKS="bm,bf" (scripts/bench_geglu_blocks.py)."""
    override = os.environ.get("SUPERDIFF_GEGLU_BLOCKS")
    if override:
        bm, bf = (int(v) for v in override.split(","))
    else:
        bf = f if c <= 320 else 512
        bm = 1024 if c <= 320 else (512 if c <= 640 else 256)
    bm = min(bm, m)
    while m % bm:
        bm //= 2
    bf = min(bf, f)
    while f % bf:
        bf //= 2
    return bm, bf


def _ffn_impl(x, gamma, beta, w1, b1, w2, b2, approximate,
              eps, fuse_ln, fuse_residual, interpret):
    m, c = x.shape
    f = w2.shape[0]
    bm, bf = _pick_blocks(m, c, f)
    if bm < 8 or bf < 128:
        if fuse_ln or fuse_residual:
            assert fuse_ln and fuse_residual
            return _reference_block(
                x, gamma[0], beta[0], w1, b1[0], w2, b2[0], eps, approximate
            )
        return _reference(x, w1, b1[0], w2, b2[0], approximate)
    n_m, n_f = m // bm, f // bf
    # w1/b1 are passed WHOLE twice; the value half reads block column j and
    # the gate half block column j + n_f of the same (C, 2F) array — slicing
    # in the wrapper materialized two (C, F) copies through HBM every step
    # (measured as a 2.3 ms kLoop fusion per L2 block in the trace).
    return pl.pallas_call(
        functools.partial(
            _kernel, n_f=n_f, approximate=approximate, eps=eps,
            fuse_ln=fuse_ln, fuse_residual=fuse_residual,
            pipe=_PIPE if bm % _PIPE == 0 and bm // _PIPE >= 8 else 1,
        ),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        grid=(n_m, n_f),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, bf), lambda i, j: (0, j)),
            pl.BlockSpec((c, bf), lambda i, j, n_f=n_f: (0, j + n_f)),
            pl.BlockSpec((1, bf), lambda i, j: (0, j)),
            pl.BlockSpec((1, bf), lambda i, j, n_f=n_f: (0, j + n_f)),
            pl.BlockSpec((bf, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bm, c), jnp.float32),
            pltpu.VMEM((bm, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The fp32 (bm, bf) value/gate intermediates are ~5 MB each at
            # the SD L1 tile (bm=1024, bf=1280), and the exact-gelu erf
            # polynomial adds elementwise temporaries on top — together past
            # the conservative 16 MB default scoped-vmem stack limit
            # (measured: 16.89 MB at batch 24). v5e has 128 MB of VMEM;
            # raise the per-kernel cap so the block choice, not the default
            # stack budget, is the binding constraint.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, gamma, beta, w1, w1, b1, b1, w2, b2)


@functools.partial(jax.custom_jvp, nondiff_argnums=(7, 8, 9, 10, 11))
def _ffn(x, gamma, beta, w1, b1, w2, b2, approximate, eps, fuse_ln,
         fuse_residual, interpret):
    return _ffn_impl(
        x, gamma[None, :].astype(jnp.float32), beta[None, :].astype(jnp.float32),
        w1, b1[None, :].astype(jnp.float32),
        w2, b2[None, :].astype(jnp.float32), approximate, eps,
        fuse_ln, fuse_residual, interpret,
    )


@_ffn.defjvp
def _ffn_jvp(approximate, eps, fuse_ln, fuse_residual, interpret,
             primals, tangents):
    """Forward-mode via the einsum reference (the ODE Itô estimator jvp's
    through the UNet; Pallas calls have no native tangent rule)."""
    x, gamma, beta, w1, b1, w2, b2 = primals

    def ref(x, gamma, beta, w1, b1, w2, b2):
        if fuse_ln or fuse_residual:
            return _reference_block(x, gamma, beta, w1, b1, w2, b2, eps,
                                    approximate)
        return _reference(x, w1, b1, w2, b2, approximate)

    return jax.jvp(ref, primals, tangents)


def geglu_ffn(
    x: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    *,
    approximate: bool = True,
    interpret: bool | None = None,
) -> Array:
    """``(v * gelu(g)) @ w2 + b2`` with ``(v, g) = split(x @ w1 + b1, 2)``.

    x: (..., C); w1: (C, 2F); b1: (2F,); w2: (F, C); b2: (C,). Leading dims
    are flattened into the row-block grid. ``approximate`` selects the gelu
    flavor (tanh vs erf) and must match the surrounding model's.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    dummy = jnp.zeros((c,), jnp.float32)
    out = _ffn(x2, dummy, dummy, w1, b1, w2, b2, approximate, 1e-5,
               False, False, interpret)
    return out.reshape(*lead, c)


def geglu_ffn_block(
    x: Array,
    gamma: Array,
    beta: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    *,
    eps: float = 1e-5,
    approximate: bool = True,
    interpret: bool | None = None,
) -> Array:
    """Full transformer FFN sub-block: ``x + FFN(LayerNorm(x))``.

    One HBM read of x, one write of the output; the fp32 LayerNorm, both
    matmuls, the gate, and the residual all stay in VMEM. gamma/beta:
    (C,) LayerNorm scale/bias (fp32, flax fast-variance convention).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    out = _ffn(x2, gamma, beta, w1, b1, w2, b2, approximate, eps,
               True, True, interpret)
    return out.reshape(*lead, c)
