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
layout. Routing by kv length:

* kv <= 256 (text cross-attention kv=77, 16x16/8x8 self levels): plain
  XLA einsum — measured fastest at every short-kv tier (BENCH_DETAIL
  ``attn_cross_routing_sweep``; the padded logits are small enough that
  XLA's fusions win). Two Pallas kernels remain as swept levers
  (``_CROSS_IMPL``): ``_kernel_mh_nat`` (packed views, per-head lane
  slices — pays Mosaic shuffles at head_dim 40) and
  ``_kernel_cross_packed`` (block-diagonal packed operands, shuffle-free).
* 256 < kv <= block_k (one kv block, e.g. L=4096 self): the
  ``_LONG_KERNELS`` family on (B, H, L, D) — per-head grid, single-pass
  softmax; default ``pvt1`` computes the PV matmul transposed so the
  head_dim-41 output pad rides sublanes (1.17x) instead of lanes (3.1x).
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


def _make_pvtd_kernel(n_chains):
    """d-major ('eod' layout) variant of the pvt kernels: q, v and o live
    in (B, H, D, L) — head_dim on *sublanes* end to end.

    The pvt kernels fixed the PV *compute* padding but kept the (B,H,L,D)
    HBM layout, whose minor dim 40 pads to 128 lanes: every q/o stream
    costs 3.2x HBM, and the projection einsums writing that layout measure
    ~25% MFU (the ``convolution_bitcast_fusion`` ops in the trace). In
    (B, H, D, L) the minor dim is L (no pad) and D=40 is exactly 5
    sublane tiles (no pad): the q/o streams and their producing/consuming
    einsums run unpadded. K deliberately STAYS (B, H, L, D): the scores
    matmul's native MXU form is A=(lk, d) x B=(d, step) — contraction on
    A's lanes and B's sublanes — so both dots in the chain take their
    operands as laid out, and the per-chain output (d+1, step) is written
    without the pvt kernels' final in-kernel transpose:

      st = K qt         (lk, step)   [A = K (lk, d), B = qt (d, step)]
      pt = exp2(st - max_0 st)
      ot = [V^T; 1] pt  (d+1, step)  [A = vt_ext, B = pt]
      o  = ot[:d] / ot[d]            (d, step) — already d-major

    Numerics identical to pvt/mxsum: same bf16 probs feed numerator and
    normalizer, fp32 MXU accumulation."""

    def kernel(qt_ref, k_ref, vt_ref, o_ref, *, scale):
        k = k_ref[0, 0, :, :]    # (lk, d)
        vt = vt_ref[0, 0, :, :]  # (d, lk)
        d = vt.shape[0]
        vt_ext = jnp.pad(vt, ((0, 1), (0, 0)), constant_values=1.0)
        bq = qt_ref.shape[3]
        step = bq // n_chains

        def chain(qt):  # (d, step), pre-scaled
            st = jax.lax.dot_general(
                k, qt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (lk, step) fp32, base-2 logits
            m = jnp.max(st, axis=0, keepdims=True)  # (1, step)
            pt = jnp.exp2(st - m).astype(vt.dtype)  # (lk, step)
            return jax.lax.dot_general(
                vt_ext, pt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d+1, step)

        scale_c = jnp.asarray(scale, qt_ref.dtype)
        ots = [
            chain(qt_ref[0, 0, :, i * step:(i + 1) * step] * scale_c)
            for i in range(n_chains)
        ]
        for i, ot in enumerate(ots):
            o_ref[0, 0, :, i * step:(i + 1) * step] = (
                ot[:d] / ot[d:d + 1]
            ).astype(o_ref.dtype)

    kernel.__name__ = f"_kernel_1block_pvtd{n_chains}"
    return kernel


_LONG_KERNELS = {
    "1block": _kernel_1block,
    "mxsum": _kernel_1block_mxsum,
    "pipe2": _make_pipe_kernel(2),
    "pipe4": _make_pipe_kernel(4),
    "pvt1": _make_pvt_kernel(1),
    "pvt2": _make_pvt_kernel(2),
    "pvt4": _make_pvt_kernel(4),
}

_LONG_KERNELS_EOD = {
    "pvtd1": _make_pvtd_kernel(1),
    "pvtd2": _make_pvtd_kernel(2),
}

# Scoped-VMEM ceiling for the long-row kernels. 96 MB covers every promoted
# configuration; the bq-4096 sweep candidates (scripts/bench_attn_kernel.py)
# need the full budget for their (lk, step) fp32 score tiles — module-level
# so the sweep can raise it without threading a parameter through callers.
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024

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


# Short-kv (kv <= 256: the 77-token text cross-attention and the
# 16x16/8x8 self levels) routing. 'einsum' = plain XLA attention — the
# measured winner at every tier (BENCH_DETAIL attn_cross_routing_sweep:
# pattern-minus-floor at L4096/C320: einsum 1.08 ms vs xpk 1.50 vs nat
# 1.69; L1024 and L256: einsum is free). The kv=77 logits tensor is small
# enough that XLA's fusions never materially touch HBM; the Pallas
# kernels stay as levers: 'nat' = per-head lane-slicing _kernel_mh_nat
# (pays Mosaic cross-lane shuffles at head_dim 40), 'xpk' = the
# block-diagonal packed kernel below (shuffle-free but ~3x the per-head
# ideal MXU tiles). Module-level so scripts/bench_attn_cross.py can A/B
# them on the chip.
_CROSS_IMPL = "einsum"
_CROSS_BLOCK_Q = 1024


def _kernel_cross_packed(q_ref, kt_ref, v_ref, s_ref, e_ref, o_ref, *,
                         heads, blk, lk, scale):
    """Block-diagonal packed cross-attention: every tensor stays in the
    (rows, packed-channels) layout and every per-head operation lands on a
    128-aligned lane tile — zero cross-lane shuffles.

    The nat kernel (``_kernel_mh_nat``) slices the packed (bq, H*D) tile
    per head at head_dim (40) lane granularity; Mosaic lowers each
    misaligned slice to cross-lane shuffles, measured ~10x the HBM bound
    at the SD L0 cross-attention shape (BENCH_DETAIL
    ``attn_cross_routing_sweep``: even XLA's materialized-logits einsum
    beats it). Here the wrapper embeds K and V into *block-diagonal*
    operands with one 128-padded kv block per head:

      kt[(h', j), (h, i)] = K[i, h, j] * δ(h, h')   (C, H*blk)
      v [(h, i), (h', j)] = V[i, h, j] * δ(h, h')   (H*blk, C)

    so ONE matmul ``q3 @ kt`` yields every head's scores in lane block h,
    and ONE matmul ``p @ v`` yields the packed (bq, C) output with each
    head's 40 channels already in place. The per-head softmax uses
    128-aligned lane slices of the (bq, H*blk) score tile (aligned slices
    are whole-tile selections — free). The normalizer rides two small
    matmuls: ``l = p @ s`` collapses each head's block to one column
    (s[(h,i), h'] = δ(h,h')), ``den = l @ e`` broadcasts it back over the
    head's channels (e[h, (h',j)] = δ(h,h')), so the division is a plain
    aligned (bq, C) elementwise op.

    MXU cost is ~3x the per-head ideal (the block-diagonal operands carry
    H x the tiles), but the ideal is negligible at kv<=128 — the kernel
    is bandwidth/latency-bound and the shuffles it deletes dominate.

    Numerics: per-head max subtraction (exact softmax); the padding rows'
    logits are 0 (zero kt columns), so the max is taken over
    max(real, 0) — a valid shift — and the pad probs are zeroed before
    the PV matmuls."""
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    s = jax.lax.dot_general(
        q, kt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, heads*blk) fp32, base-2 logits; pad columns exactly 0
    valid = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], blk), 1) < lk
    parts = []
    for h in range(heads):
        sh = s[:, h * blk:(h + 1) * blk]  # 128-aligned lane slice: free
        mh = jnp.max(sh, axis=1, keepdims=True)  # >= true max (pads are 0)
        parts.append(jnp.where(valid, jnp.exp2(sh - mh), 0.0))
    p = jnp.concatenate(parts, axis=1).astype(v_ref.dtype)
    num = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, C) packed numerators
    l = jax.lax.dot_general(
        p, s_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, heads) row sums
    den = jax.lax.dot_general(
        l.astype(e_ref.dtype), e_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, C): head h's sum broadcast over its 40 channels
    o_ref[0] = (num / den).astype(o_ref.dtype)


def _cross_packed(q, k, v, scale, block_q, interpret):
    """Wrapper for ``_kernel_cross_packed``: builds the block-diagonal
    operands (cheap at kv <= 128: ~16-32 MB per SD layer, one XLA
    broadcast-multiply each) and keeps q/o in the packed (B, L, C) layout
    the projections produce — no head_dim lane padding on the big streams.
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    c = h * d
    blk = 128
    q3 = q.reshape(b, lq, c)
    eye = jnp.eye(h, dtype=k.dtype)
    kp = jnp.pad(k, ((0, 0), (0, blk - lk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, blk - lk), (0, 0), (0, 0)))
    kt = jnp.einsum("bihd,hg->bgdhi", kp, eye).reshape(b, c, h * blk)
    vt = jnp.einsum("bihd,hg->bhigd", vp, eye).reshape(b, h * blk, c)
    s_mat = jnp.kron(eye, jnp.ones((blk, 1), k.dtype))  # (h*blk, h)
    e_mat = jnp.kron(eye, jnp.ones((1, d), k.dtype))  # (h, c)
    bq = min(block_q, lq)
    while lq % bq:
        bq //= 2
    n_q = lq // bq
    out = pl.pallas_call(
        functools.partial(
            _kernel_cross_packed, heads=h, blk=blk, lk=lk, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
        grid=(b, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, c, h * blk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, h * blk, c), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((h * blk, h), lambda b, i: (0, 0)),
            pl.BlockSpec((h, c), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q3, kt, vt, s_mat, e_mat)
    return out.reshape(b, lq, h, d)


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
                    vmem_limit_bytes=_VMEM_LIMIT_BYTES,
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
                vmem_limit_bytes=_VMEM_LIMIT_BYTES,
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
        # short kv (cross-attention kv=77, 16x16/8x8 self levels):
        # XLA einsum is the measured winner at every short-kv tier (see
        # _CROSS_IMPL); the Pallas kernels remain as swept levers.
        if _CROSS_IMPL == "xpk" and lk <= 128 and lq >= 4 * h * 128:
            # block-diagonal packed kernel — zero lane shuffles, q/o stay
            # packed. Gated on lq >> H*blk so the block-diagonal K/V
            # construction (4*C*H*128 bytes of HBM per layer) is small
            # against the q/o streams it optimizes.
            return _cross_packed(q, k, v, scale, _CROSS_BLOCK_Q, interpret)
        if _CROSS_IMPL == "nat" or (_CROSS_IMPL == "xpk" and lk <= 256):
            # native-layout all-heads kernel on packed (B, L, H*D) views
            # (zero transposes, but per-head 40-lane slices cost Mosaic
            # cross-lane shuffles on long rows)
            return _flash_nat_packed(q, k, v, scale, block_q, interpret)
        return _reference(q, k, v, sm_scale)
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


# Kernel + q block for the d-major ('flash_eod') entry below; module-level
# so the on-chip sweep (scripts/bench_attn_eod.py) can A/B them. pvtd2 at
# bq4096 (two 2048-row chains per program, MXU/VPU-overlapped) is the
# measured winner at the SD L0 pattern (BENCH_DETAIL attn_long_eod_sweep:
# 10.97 ms/iter vs 11.09 pvtd1/bq2048, 11.70 bhld pvt1/bq2048). The mid
# tier (kv <= 1024, e.g. L=1024/D=80) prefers a single chain at bq2048
# (attn_eod_sweep_L1024_C640: pvtd1 3.52 vs pvtd2/bq4096 4.02 vs 3.70 for
# the incumbent bhld mh kernel).
_EOD_IMPL = "pvtd2"
_EOD_BLOCK_Q = 4096
_EOD_IMPL_MID = "pvtd1"
_EOD_BLOCK_Q_MID = 2048


def _reference_eod(qt: Array, k: Array, vt: Array, sm_scale: float) -> Array:
    """Einsum attention in the d-major layout: qt/vt/out (B, H, D, L),
    k (B, H, L, D)."""
    logits = jnp.einsum(
        "bhdq,bhkd->bhqk", qt, k).astype(jnp.float32) * sm_scale
    attn = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
    return jnp.einsum("bhqk,bhdk->bhdq", attn, vt)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6))
def _flash_eod(qt, k, vt, sm_scale, block_q, interpret, impl):
    b, h, d, lq = qt.shape
    lk = k.shape[2]
    scale = float(sm_scale * _LOG2_E)
    return pl.pallas_call(
        functools.partial(_LONG_KERNELS_EOD[impl], scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=(b, h, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, d, block_q), lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((1, 1, lk, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, d, lk), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d, block_q), lambda b, h, i: (b, h, 0, i)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # same rationale as the bhld long kernels: the (lk, step)
            # fp32 score tile alone is 32 MB at (4096, 2048)
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(qt, k, vt)


@_flash_eod.defjvp
def _flash_eod_jvp(sm_scale, block_q, interpret, impl, primals, tangents):
    """Forward-mode via the d-major einsum reference (same pattern as
    ``_flash_jvp``: the ODE Itô estimator jvp's through the UNet)."""
    return jax.jvp(
        lambda qt, k, vt: _reference_eod(qt, k, vt, sm_scale),
        primals, tangents,
    )


def flash_mha_eod(
    qt: Array,
    k: Array,
    vt: Array,
    *,
    sm_scale: float | None = None,
    block_q: int | None = None,
    interpret: bool | None = None,
) -> Array:
    """Long-row attention with q, v and the output in the d-major
    (B, H, D, L) layout and k in (B, H, L, D) — the 'flash_eod' lever's
    entry point.

    (B, H, L, D) pads head_dim 40 to 128 lanes in HBM: the flash_eo
    projections writing it measure ~25% MFU and the q/o streams carry
    3.2x their real bytes. In (B, H, D, L) the minor dim is L (unpadded)
    and D=40 is exactly 5 sublane tiles, so the producing einsums
    (``blc,chd->bhdl``), the kernel streams, and the consuming out-proj
    (``bhdl,hdc->blc``) all run unpadded; K stays (B, H, L, D) because
    the scores matmul consumes it in that layout natively (see
    ``_make_pvtd_kernel``). Designed for the single-kv-block long tier
    (the SD 4096-token self-attention); anything that doesn't fit it
    (multi-block kv, short rows, non-tiling shapes, non-TPU without
    interpret) transposes into ``flash_mha_bhld``'s dispatch instead.
    """
    b, h, d, lq = qt.shape
    lk = k.shape[2]
    if sm_scale is None:
        sm_scale = d**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # per-tier kernel selection (see the module-level defaults)
    if lk > 1024:
        impl, bq_default = _EOD_IMPL, _EOD_BLOCK_Q
    else:
        impl, bq_default = _EOD_IMPL_MID, _EOD_BLOCK_Q_MID
    block_q = block_q or min(bq_default, lq)
    while lq % block_q:
        block_q //= 2
    chains = int(impl[-1]) if impl in _LONG_KERNELS_EOD else 1
    if (lk > 4096 or lk <= 256 or lk % 8 or d % 8
            or impl not in _LONG_KERNELS_EOD
            # each chain's q slice must land on 128-lane boundaries
            or block_q % (128 * chains)):
        out = flash_mha_bhld(
            qt.transpose(0, 1, 3, 2), k, vt.transpose(0, 1, 3, 2),
            sm_scale=sm_scale, interpret=interpret,
        )
        return out.transpose(0, 1, 3, 2)
    return _flash_eod(qt, k, vt, sm_scale, block_q, interpret, impl)


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

    Dispatch by kv length (see the module docstring): kv <= 256 routes
    to plain XLA einsum (the measured winner at short kv; Pallas levers
    via ``_CROSS_IMPL``); 256 < kv <= 1024 (one kv block) to the
    single-pass per-head kernel; longer kv to the online-softmax flash
    loop. kv <= 1024 always uses the full row as the kv block — a
    caller-supplied ``block_k`` only takes effect on the multi-block
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
        # kv fits one block: the whole row is the kv block (single-pass
        # softmax for the mid kernels; kv <= 256 routes to einsum inside
        # _flash). This deliberately overrides any caller block_k.
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
