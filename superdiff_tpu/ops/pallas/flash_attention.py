"""Flash (online-softmax) multi-head attention — Pallas TPU kernel.

Why this exists: the SD-1.x UNet self-attends over 4096 latent tokens with
head_dim 40. XLA's lowering of plain attention materializes the fp32 logits
tensor ``f32[B,8,4096,4096]`` (12.9 GB at B=24) through HBM for the softmax
and reads it back for the PV matmul — measured at ~52 ms per layer on v5e,
~10x the compute bound. This kernel keeps the scores tile in VMEM, carries
the usual (m, l, acc) online-softmax state in fp32 scratch, and writes only
the (B, L, H, D) output: one HBM pass over Q/K/V/O.

Reference behavior target: the torch SDPA attention inside the diffusers
UNet the reference drives (``applications/images/clip_eval.py:97`` — note
the reference must *disable* flash to jvp through it; here the custom_jvp
rule routes forward-mode through the einsum path so the ODE Itô estimator
differentiates cleanly while sampling still gets the fused kernel).

The public API takes (batch, seq, heads, head_dim) — the UNet's native
layout. Three kernel variants, chosen by kv length:

* kv <= 256 (text cross-attention kv=77, 16x16/8x8 self levels):
  ``_kernel_mh_nat`` — all heads per program via static lane slices of the
  packed (B, L, H*D) views; zero transposes, softmax entirely in VMEM.
* 256 < kv <= block_k (one kv block, e.g. L=4096 self): ``_kernel_1block``
  on (B, H, L, D) — per-head grid, single-pass softmax, no online carry.
  The transpose is forced by Mosaic's lane-block rule (128-multiple or the
  full dim): per-head lane slicing at head_dim 40 is not lowerable.
* multi-block kv: ``_kernel`` — the classic online-softmax flash loop with
  fp32 (m, l, acc) scratch.

All variants scale q by sm_scale*log2(e) on the in-VMEM tile (wrapper-side
scaling materialized an fp32 HBM copy of q) and softmax in base 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30  # not -inf: exp(-inf - -inf) = nan


def _reference(q: Array, k: Array, v: Array, sm_scale: float) -> Array:
    """Plain einsum attention, (B, L, H, D) layout, fp32 softmax."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * sm_scale
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, n_k, scale):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scale q on its small (bq, D) tile in VMEM — scaling in the wrapper
    # materialized an fp32 copy of the whole q tensor through HBM (an
    # 0.8 ms layout copy per L0 layer in the trace); softmax runs in base 2
    # — exp2 skips the x*log2(e) the VPU's exp pays internally.
    q = q_ref[0, 0, :, :] * jnp.asarray(scale, q_ref.dtype)  # (bq, D)
    k = k_ref[0, 0, :, :]  # (bk, D)
    v = v_ref[0, 0, :, :]  # (bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk) fp32, base-2 logits

    m_prev = m_ref[:, 0:1]  # (bq, 1)
    l_prev = l_ref[:, 0:1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)  # (bq, 1)
    p = jnp.exp2(s - m_next)  # (bq, bk) fp32; row max -> 1, so l >= 1
    l_ref[:] = jnp.broadcast_to(alpha * l_prev + jnp.sum(p, axis=1, keepdims=True),
                                l_ref.shape)
    m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == n_k - 1)
    def _store():
        o_ref[0, 0, :, :] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


def _kernel_1block(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Single-kv-block softmax: the whole row fits one tile (the measured-
    fastest configuration at L=4096), so the online (m, l, acc) carry and
    its rescaling rounds are dead weight — one max, one exp2, one sum."""
    q = q_ref[0, 0, :, :] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, lk) fp32, base-2 logits (scale folded into the q tile)
    m = jnp.max(s, axis=1, keepdims=True)
    # probs stay fp32: bf16 probs (packed exp2, 2x VPU lanes) were measured
    # and lost — the extra casts outweigh the exp2 saving at these tile sizes
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, :, :] = (pv / l).astype(o_ref.dtype)


def _kernel_1block_mxsum(q_ref, k_ref, v_ref, o_ref, *, scale):
    """``_kernel_1block`` with the softmax normalizer folded into the PV
    matmul: V gains a ones column, so ``p @ [V | 1]`` yields the (bq, D)
    numerator AND the (bq, 1) row sum in ONE MXU pass. head_dim 40 pads to
    128 output lanes on the MXU either way — lane 40 is free real estate —
    while the VPU loses a full reduce pass over the (bq, lk) probs tile
    (~1.6G elements/layer at the SD L0 shape; the reduce is serial with
    the MXU inside a program, so it is pure added latency).

    Numerics vs ``_kernel_1block``: the row sum is now accumulated from the
    SAME bf16-quantized probs the PV matmul consumes (fp32 accumulation on
    the MXU), instead of from the pre-cast fp32 probs. With the row max
    subtracted, p in (0, 1]; the quantization is unbiased with relative
    error 2^-9 per element, so the normalizer moves by ~2^-9/sqrt(lk)
    relative — two orders below the bf16 output grid (and arguably more
    consistent: numerator and denominator now see identical probs)."""
    q = q_ref[0, 0, :, :] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    d = v.shape[1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, lk) fp32, base-2 logits
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m).astype(v.dtype)  # one fused VPU pass incl. the cast
    v_ext = jnp.pad(v, ((0, 0), (0, 1)), constant_values=1.0)  # (lk, d+1)
    pv = jax.lax.dot_general(
        p, v_ext, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d+1): [:, :d] = numerator, [:, d] = row sum l
    o_ref[0, 0, :, :] = (pv[:, :d] / pv[:, d:d + 1]).astype(o_ref.dtype)


def _make_pipe_kernel(n_chains):
    """``_kernel_1block_mxsum`` with the q block split into ``n_chains``
    independent sub-block chains, interleaved so Mosaic's scheduler can
    overlap one chain's softmax (VPU) with another's matmuls (MXU). A
    single chain is strictly QK^T (MXU) -> softmax (VPU) -> PV (MXU): the
    units serialize and the softmax VPU time is pure added latency;
    dependency-free chains give the scheduler the slack to hide it."""

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        d = v.shape[1]
        v_ext = jnp.pad(v, ((0, 0), (0, 1)), constant_values=1.0)
        bq = q_ref.shape[2]
        step = bq // n_chains

        def chain(q):
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m).astype(v.dtype)
            return jax.lax.dot_general(
                p, v_ext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        scale_c = jnp.asarray(scale, q_ref.dtype)
        pvs = [
            chain(q_ref[0, 0, i * step:(i + 1) * step, :] * scale_c)
            for i in range(n_chains)
        ]
        for i, pv in enumerate(pvs):
            o_ref[0, 0, i * step:(i + 1) * step, :] = (
                pv[:, :d] / pv[:, d:d + 1]
            ).astype(o_ref.dtype)

    kernel.__name__ = f"_kernel_1block_pipe{n_chains}"
    return kernel


def _make_pvt_kernel(n_chains):
    """Transposed-PV variant of the pipe kernels: computes ``o^T = [V|1]^T
    p^T`` so the head_dim-41 output dimension lands on MXU *sublanes*
    (41 -> 48, 1.17x pad) instead of *lanes* (41 -> 128, 3.1x pad).

    The head-packing analysis (STATUS.md) shows lane padding at head_dim
    40 is geometric for any layout that keeps the head dim on lanes; this
    variant instead moves it to the 8-granular sublane axis. Per chain at
    (bq, lk, d) = (1024, 4096, 40), in (M/8)*ceil(K/128)*ceil(N/128) MXU
    units: scores K q^T (lk/8)*1*(bq/128) = 4096 (identical to q K^T —
    the d=40 *contraction* pad is unavoidable), but PV drops from
    (bq/8)*(lk/128)*ceil(41/128 -> 1) = 4096 to transposed
    (ceil(48/8))*(lk/128)*(bq/128) = 1536: ~31% fewer MXU units total.
    Costs: V arrives transposed (one XLA layout copy per layer — removable
    by emitting the v projection as ``blc,chd->bhdl``), the softmax
    reduces across sublanes instead of lanes, and each chain ends with a
    small (d, step) -> (step, d) in-kernel transpose of the fp32 output.

    Numerics match ``mxsum`` exactly: same bf16 probs feed numerator and
    normalizer (the ones now a *row* of V^T), fp32 MXU accumulation."""

    def kernel(q_ref, k_ref, vt_ref, o_ref, *, scale):
        k = k_ref[0, 0, :, :]   # (lk, d)
        vt = vt_ref[0, 0, :, :]  # (d, lk)
        d = vt.shape[0]
        vt_ext = jnp.pad(vt, ((0, 1), (0, 0)), constant_values=1.0)
        bq = q_ref.shape[2]
        step = bq // n_chains

        def chain(q):  # q: (step, d), pre-scaled
            st = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (lk, step) fp32, base-2 logits
            m = jnp.max(st, axis=0, keepdims=True)  # (1, step)
            pt = jnp.exp2(st - m).astype(vt.dtype)  # (lk, step)
            return jax.lax.dot_general(
                vt_ext, pt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d+1, step): [:d] = numerator^T, [d] = row sums

        scale_c = jnp.asarray(scale, q_ref.dtype)
        ots = [
            chain(q_ref[0, 0, i * step:(i + 1) * step, :] * scale_c)
            for i in range(n_chains)
        ]
        for i, ot in enumerate(ots):
            o_ref[0, 0, i * step:(i + 1) * step, :] = (
                (ot[:d] / ot[d:d + 1]).T
            ).astype(o_ref.dtype)

    kernel.__name__ = f"_kernel_1block_pvt{n_chains}"
    return kernel


_LONG_KERNELS = {
    "1block": _kernel_1block,
    "mxsum": _kernel_1block_mxsum,
    "pipe2": _make_pipe_kernel(2),
    "pipe4": _make_pipe_kernel(4),
    "pvt1": _make_pvt_kernel(1),
    "pvt2": _make_pvt_kernel(2),
}

# Default single-kv-block kernel for long rows (the L=4096 self-attention
# path). Module-level so the on-chip sweep (scripts/bench_attn_kernel.py)
# can A/B the variants without threading a parameter through every caller.
# 'pvt1' at block_q 1024 is the measured winner at the production SD shape
# (B24 H8 L4096 D40, projections+kernel+out-proj scan, BENCH_DETAIL
# attn_long_blockq_sweep): 12.04 ms/iter vs 13.12 'pipe2' / 13.09 'pipe4'
# / 15.20 '1block' — transposing the PV matmul moves the head_dim-41
# output axis from 128-lane padding to 8-sublane padding (~2.7x fewer MXU
# tiles on the PV pass); one full-block chain amortizes the transposed
# score tile best (pvt2's split chains lose: 12.30).
_LONG_IMPL = "pvt1"

# q-block rows per program for the long-row path (grid parallelism vs
# per-chain matmul size trade; swept on-chip by scripts/bench_attn_kernel.py
# together with the kernel variant — BENCH_DETAIL attn_long_blockq_sweep:
# pvt1 at bq 256/512/1024/2048 = 15.61/13.68/12.47/11.73 ms/iter, pipe2 =
# 14.60/13.80/13.07/12.91). 2048 = the measured best for the promoted pvt1
# kernel (headline A/B `sd_headline_bq2048`: 1.0023 vs 0.9889 img/s at
# 1024): at L=4096 only 2 programs per (b, h) remain, but the transposed
# (lk, step) score tile amortizes the kv stream best; block_q is clamped
# to the row length for shorter sequences.
_LONG_BLOCK_Q = 2048

# kv-length ceiling for the all-heads-per-program kernel (_kernel_mh);
# single-block rows longer than this route to the per-head _LONG_KERNELS
# path. Module-level so scripts/bench_attn_mid.py can A/B the routing of
# the mid tier (L=1024, head_dim 80 — the SD 32x32 self level) between
# the mh kernel and the long/pvt kernels on the chip.
_MH_MAX_KV = 1024


def _kernel_mh(q_ref, k_ref, v_ref, o_ref, *, heads, scale):
    """All-heads-per-program single-block softmax, for short kv rows (text
    cross-attention kv=77, self-attention at the 16x16/8x8 levels).

    Per-head grids pay a fixed per-program cost that dominates when the
    per-head tile is small (measured ~2 ms for L=256 self-attention at
    B=24 — pure overhead); looping the 8 heads inside one program
    amortizes it 8x. kv is tiny, so the whole (heads, lk, D) K/V block
    plus one head's (bq, lk) score tile live in VMEM. The head loop is a
    ``fori_loop`` (not an unrolled Python loop) so Mosaic reuses one
    head's score/probs buffers instead of stacking all of them."""

    def one_head(h, _):
        q = q_ref[0, h, :, :] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, h, :, :]
        v = v_ref[0, h, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h, :, :] = (pv / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, one_head, 0, unroll=False)



def _kernel_mh_nat(q_ref, k_ref, v_ref, o_ref, *, heads, head_dim, scale):
    """Native-layout all-heads kernel for short kv (cross-attention kv=77,
    16x16/8x8 self levels): one program per q block processes every head via
    static lane slices of the packed (bq, H*D) tile. Heads are unrolled in
    Python — per-head score tiles are small (bq x lk), so Mosaic's
    stack allocation of the unrolled bodies stays well under VMEM."""
    d = head_dim
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        q = q_ref[0, :, sl] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (pv / l).astype(o_ref.dtype)


_LOG2_E = 1.4426950408889634


def _flash_impl(q, k, v, sm_scale, block_q, block_k, interpret):
    """q, k, v: (B, H, L, D) — Pallas block alignment needs (L, D) as the
    trailing dims (the wrapper transposes from the UNet's (B, L, H, D))."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    n_q, n_k = lq // block_q, lk // block_k

    # sm_scale and the base-2 conversion are folded into the q tile inside
    # each kernel (scaling here would materialize a scaled copy of q in HBM)
    scale = float(sm_scale * _LOG2_E)
    grid = (b, h, n_q, n_k)
    if n_k == 1 and lk <= _MH_MAX_KV:
        # short kv: amortize per-program overhead over all heads
        return pl.pallas_call(
            functools.partial(_kernel_mh, heads=h, scale=scale),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(b, n_q),
            in_specs=[
                pl.BlockSpec((1, h, block_q, d), lambda b, i: (b, 0, i, 0)),
                pl.BlockSpec((1, h, lk, d), lambda b, i: (b, 0, 0, 0)),
                pl.BlockSpec((1, h, lk, d), lambda b, i: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, block_q, d), lambda b, i: (b, 0, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(q, k, v)
    if n_k == 1:
        if _LONG_IMPL.startswith("pvt"):
            # the transposed-PV kernels consume V as (B, H, D, L). The
            # wrapper-side transpose is NOT a runtime copy on the flash_eo
            # path: XLA folds it into the preceding projection einsum
            # (``blc,chd->bhld`` simply becomes ``blc,chd->bhdl``).
            vt = v.transpose(0, 1, 3, 2)
            return pl.pallas_call(
                functools.partial(_LONG_KERNELS[_LONG_IMPL], scale=scale),
                out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
                grid=(b, h, n_q),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0)),
                    pl.BlockSpec((1, 1, block_k, d), lambda b, h, i: (b, h, 0, 0)),
                    pl.BlockSpec((1, 1, d, block_k), lambda b, h, i: (b, h, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, block_q, d), lambda b, h, i: (b, h, i, 0)
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "parallel"),
                    # the transposed (lk, step) fp32 score tile is 16 MB at
                    # (4096, 1024) — past the 16 MB default scoped-vmem
                    # stack; v5e has 128 MB of VMEM (same rationale as the
                    # GEGLU block kernel).
                    vmem_limit_bytes=96 * 1024 * 1024,
                ),
                interpret=interpret,
            )(q, k, vt)
        return pl.pallas_call(
            functools.partial(_LONG_KERNELS[_LONG_IMPL], scale=scale),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(b, h, n_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b, h, i: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
                # the (block_q, lk) fp32 score tiles pass the 16 MB default
                # scoped-vmem stack above bq 512 ('1block' keeps fp32 probs:
                # 2 tiles) and at the swept bq 2048 chain shapes; v5e has
                # 128 MB of VMEM (same rationale as the GEGLU block kernel).
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q, k, v)
    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max m
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum l
            pltpu.VMEM((block_q, d), jnp.float32),  # unnormalized output acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_nat_packed(q, k, v, scale, block_q, interpret):
    """Native-layout single-kv-block path on packed (B, L, H*D) views —
    ZERO transposes for any kv length that fits one block.

    The short-kv dispatch below uses this with the full q row; for long kv
    (4096-token self-attention) the per-head score tiles are (block_q, lk)
    fp32 and the heads are unrolled in Python (lane slices must be static),
    so ``block_q`` stays small (default 64: 8 heads x 64x4096x4 B = 8 MB
    worst-case if Mosaic stacks the unrolled buffers, ~1 MB with liveness
    reuse) to keep the stacked worst case inside VMEM. K/V block indices
    depend only on b, so Pallas fetches them once per batch row — HBM
    traffic is exactly one pass over Q/K/V/O, eliminating the 4
    layout-copy ops per layer (``convolution_bitcast_fusion`` in the
    trace, ~10 ms/forward at batch 24) that the (B, H, L, D) kernels
    force."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    q3 = q.reshape(b, lq, h * d)
    k3 = k.reshape(b, lk, h * d)
    v3 = v.reshape(b, lk, h * d)
    n_q = lq // block_q
    out = pl.pallas_call(
        functools.partial(_kernel_mh_nat, heads=h, head_dim=d, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, h * d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lk, h * d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, lk, h * d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h * d), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, lq, h, d)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, sm_scale, block_q, block_k, interpret, native_long_kv):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = float(sm_scale * _LOG2_E)
    if native_long_kv and block_k == lk:
        # opt-in: the transpose-free packed path at ANY single-block kv
        # length (unmeasured on hardware until scripts/bench_attn_layout.py
        # runs; candidate (d) there). Small q blocks bound the unrolled
        # per-head score tiles.
        bq = block_q if lk <= 256 else min(64, block_q)
        while lq % bq:
            bq //= 2
        if bq >= 8:
            return _flash_nat_packed(q, k, v, scale, bq, interpret)
    if block_k == lk and lk <= 256:
        # short kv (cross-attention kv=77, 16x16/8x8 self levels): the
        # native-layout all-heads kernel on packed (B, L, H*D) views
        # (reshape is a free bitcast; no transposes). Mosaic requires lane
        # blocks to be 128-multiples or the full dim, so per-head lane
        # slicing (head_dim 40) is only legal with the full H*D block —
        # here the per-head score tiles of the unrolled head loop stay
        # small at the full-row q block.
        return _flash_nat_packed(q, k, v, scale, block_q, interpret)
    out = _flash_impl(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        sm_scale, block_q, block_k, interpret,
    )
    return out.transpose(0, 2, 1, 3)


@_flash.defjvp
def _flash_jvp(sm_scale, block_q, block_k, interpret, native_long_kv,
               primals, tangents):
    """Forward-mode via the einsum reference (the ODE Itô estimator jvp's
    through the UNet; flash primitives have no native tangent rule)."""
    return jax.jvp(lambda q, k, v: _reference(q, k, v, sm_scale), primals, tangents)


def _reference_bhld(q: Array, k: Array, v: Array, sm_scale: float) -> Array:
    """Plain einsum attention staying in the kernel's (B, H, L, D) layout."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6))
def _flash_bhld(q, k, v, sm_scale, block_q, block_k, interpret):
    return _flash_impl(q, k, v, sm_scale, block_q, block_k, interpret)


@_flash_bhld.defjvp
def _flash_bhld_jvp(sm_scale, block_q, block_k, interpret, primals, tangents):
    """Forward-mode via the in-layout einsum reference (same pattern as
    ``_flash_jvp``: the ODE Itô estimator jvp's through the UNet)."""
    return jax.jvp(
        lambda q, k, v: _reference_bhld(q, k, v, sm_scale), primals, tangents
    )


def flash_mha_bhld(
    q: Array,
    k: Array,
    v: Array,
    *,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Multi-head attention on tensors ALREADY in the kernel's (B, H, L, D)
    layout — the 'flash_eo' lever's entry point.

    ``flash_mha`` transposes (B, L, H, D) inputs into (B, H, L, D) for the
    long-kv kernels and transposes the output back: 4 layout copies of the
    (24, 4096, 320) stream per layer, measured ~0.42 ms each on v5e
    (``scripts/bench_attn_layout.py``: variant (b) 15.00 ms vs (a) 15.73).
    When the caller can *produce* q/k/v in kernel layout (einsum projections
    ``blc,chd->bhld``) and *consume* the output in kernel layout (out-proj
    ``bhld,hdc->blc``), this entry skips all four. Same kernels, same
    dispatch rules as ``flash_mha``; einsum-reference fallback when the
    sequence doesn't tile.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if sm_scale is None:
        sm_scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = block_q or min(_LONG_BLOCK_Q if lk > 1024 else 512, lq)
    if lk <= 1024:
        block_k = lk
    else:
        block_k = block_k or min(4096, lk)
    while lq % block_q:
        block_q //= 2
    while lk % block_k:
        block_k //= 2
    if block_q < 8 or (block_k < 128 and block_k != lk):
        return _reference_bhld(q, k, v, sm_scale)
    return _flash_bhld(q, k, v, sm_scale, block_q, block_k, interpret)


def flash_mha(
    q: Array,
    k: Array,
    v: Array,
    *,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
    native_long_kv: bool = False,
) -> Array:
    """Multi-head attention ``softmax(q k^T * sm_scale) v``, (B, L, H, D).

    Three-kernel dispatch by kv length (see the module docstring):
    kv <= 256 routes to the native-layout all-heads kernel on packed
    (B, L, H*D) views (zero transposes); 256 < kv <= 1024 (one kv block)
    to the single-pass per-head kernel; longer kv to the online-softmax
    flash loop. kv <= 1024 always uses the full row as the kv block —
    a caller-supplied ``block_k`` only takes effect on the multi-block
    path. Falls back to the einsum reference when the sequence doesn't
    tile (block_q < 8, or a non-full kv block < 128 lanes) or when
    running off-TPU without ``interpret``.

    ``native_long_kv=True`` (opt-in, pending hardware measurement —
    ``scripts/bench_attn_layout.py`` candidate (d)) extends the
    transpose-free packed-layout path to ANY kv that fits one block
    (e.g. the 4096-token self-attention), with small q blocks bounding
    the unrolled per-head score tiles. Bit-identical math to the
    transposed kernels (same per-head tile ops).
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if sm_scale is None:
        sm_scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Measured on v5e at (24, 4096, 8, 40): full-row kv blocks win (13.8 ms
    # vs 15.7 at 1024/1024) — one softmax pass, no online rescaling rounds.
    # Scores tile 512x4096 fp32 = 8 MB VMEM, well within budget.
    block_q = block_q or min(_LONG_BLOCK_Q if lk > 1024 else 512, lq)
    if lk <= 1024:
        # short kv (77-token text cross-attention, 16x16/8x8 self levels):
        # the whole row is one block for the all-heads kernel. XLA's einsum
        # path materializes fp32 logits through HBM even at kv=77 (measured
        # 2.3 ms/layer at L=4096 — ~1 GB of score traffic); the kernel keeps
        # them in VMEM. This deliberately overrides any caller block_k.
        block_k = lk
    else:
        block_k = block_k or min(4096, lk)
    # shrink to the largest divisor tile (sequence lengths here are powers
    # of two; kv=77 only occurs with block_k == lk, which always divides)
    while lq % block_q:
        block_q //= 2
    while lk % block_k:
        block_k //= 2
    if block_q < 8 or (block_k < 128 and block_k != lk):
        return _reference(q, k, v, sm_scale)
    return _flash(q, k, v, sm_scale, block_q, block_k, interpret,
                  native_long_kv)
