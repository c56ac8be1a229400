"""Sequence-parallel (ring) attention over a device mesh.

Beyond the reference's parallelism story: the reference has **no
sequence/context parallelism at all** (SURVEY.md §2.5 — its longest
attention rows are the SD UNet's 4096 latent tokens on one GPU and the
protein stack's N<=512 residues). This module adds the TPU-native SP/CP
primitive so attention rows longer than one chip's HBM/compute budget span
the mesh: Q/K/V are sharded over the sequence axis, each device owns an
L/N-token slice, and K/V blocks rotate around the ring via
``lax.ppermute`` (one ICI hop per step, bandwidth-optimal — no all-gather
of the full sequence anywhere). Per-step partial attention is merged with
the standard online-softmax state ``(m, l, o)`` in fp32, so the result is
bit-for-bit independent of ring order and **exact** vs single-device
attention (tests/test_sp.py pins equality on the 8-device virtual mesh).

Layout and numerics notes (TPU):

* Per-shard inputs are ``(B, L/N, H, D)`` — the UNet's native layout; the
  per-block scores/PV matmuls run in the input dtype (bf16 on the MXU)
  with fp32 ``(m, l, o)`` accumulators, exactly like the single-chip flash
  kernels in ``ops/pallas/flash_attention.py``.
* The per-block compute here is a plain einsum: at shard sizes
  (L/N x L/N logits) the tile fits comfortably, and XLA overlaps the
  ``ppermute`` DMA of the *next* K/V block with the current block's
  matmuls (the permute's operands are disjoint from the compute's). A
  Pallas local block that also returns ``(m, l)`` could slot in later
  without changing the collective structure.
* Non-causal only, matching every attention in this framework (SD UNet
  self/cross, protein IPA/triangle tiers are masked-bias, not causal).

No reference counterpart — cite: absent per SURVEY.md §2.5 ("Sequence/
context parallel ... none").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def ring_attention_local(
    q: Array,
    k: Array,
    v: Array,
    *,
    axis_name: str,
    sm_scale: Optional[float] = None,
) -> Array:
    """Ring attention body — call INSIDE ``shard_map`` (or any context where
    ``axis_name`` is a bound mesh axis).

    Args:
      q, k, v: per-device shards, ``(B, L_shard, H, D)``; the global
        sequence is the concatenation of shards along axis 1 in
        device-ring order.
      axis_name: the mesh axis the sequence is sharded over.
      sm_scale: softmax scale; defaults to ``1/sqrt(D)``.

    Returns the per-device output shard ``(B, L_shard, H, D)`` in q's dtype.
    """
    n = lax.axis_size(axis_name)
    b, l_q, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)

    # fp32 online-softmax state; scores roll around the ring.
    o0 = jnp.zeros((b, h, l_q, d), jnp.float32)
    m0 = jnp.full((b, h, l_q), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, l_q), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(_, carry):
        o, m, l_sum, k_cur, v_cur = carry
        # (B, H, Lq, Lk) block logits in fp32 (matmul in input dtype).
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k_cur).astype(jnp.float32)
            * sm_scale
        )
        m_new = jnp.maximum(m, logits.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l_sum * corr + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v_cur.dtype), v_cur)
        o_new = o * corr[..., None] + pv.astype(jnp.float32)
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return o_new, m_new, l_new, k_nxt, v_nxt

    o, _, l_sum, _, _ = lax.fori_loop(
        0, n, step, (o0, m0, l0, k, v), unroll=False
    )
    out = o / l_sum[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    *,
    axis_name: str = "sp",
    sm_scale: Optional[float] = None,
    batch_axis: Optional[str] = None,
) -> Array:
    """Sequence-parallel attention on full ``(B, L, H, D)`` operands.

    Shards the sequence axis of q/k/v over ``axis_name`` of ``mesh``
    (optionally the batch axis over ``batch_axis``), runs the ring, and
    returns the full output with the same sharding. L must divide evenly
    by the axis size (pad upstream — attention over ragged shards would
    need a mask this framework has no caller for).
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f"sequence length {q.shape[1]}/{k.shape[1]} not divisible by "
            f"mesh axis '{axis_name}' of size {n}"
        )
    spec = P(batch_axis, axis_name, None, None)
    fn = shard_map(
        functools.partial(
            ring_attention_local, axis_name=axis_name, sm_scale=sm_scale
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
