"""AF2/openfold pair-representation primitives (Flax), weight-compatible.

JAX rebuilds of the modules the reference Proteus model composes at
inference (citations into /root/reference/applications/proteins/Proteus):

* ``proteus_model/msa.py:148`` Attention (AF2 gated attention, bias list)
* ``proteus_openfold/model/triangular_multiplicative_update.py:26-130``
  TriangleMultiplication outgoing/incoming (Algorithms 11/12)
* ``proteus_openfold/model/pair_transition.py:24-98`` PairTransition
* ``proteus_openfold/model/template.py:240-330`` LightTemplatePairStackBlock
* ``proteus_openfold/model/template.py:44-132`` TemplatePointwiseAttention
* ``proteus_model/score_network.py:353-383`` TemplateColumnWiseAttention
* ``proteus_openfold/model/embedders.py:228-310`` template angle/pair
  embedders

Parameter names mirror the torch module names so the checkpoint converter
maps mechanically. All dropout layers in the originals are inference
no-ops (model.eval()) and are omitted.
"""

from __future__ import annotations

import math
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class GatedAttention(nn.Module):
    """AF2 attention with bias list and sigmoid gating (msa.py:148-280)."""

    c_q: int
    c_k: int
    c_v: int
    c_hidden: int
    no_heads: int
    gating: bool = True

    @nn.compact
    def __call__(self, q_x: Array, kv_x: Array,
                 biases: Optional[List[Array]] = None) -> Array:
        biases = biases or []
        h, ch = self.no_heads, self.c_hidden
        q = nn.Dense(ch * h, use_bias=False, name="linear_q")(q_x)
        k = nn.Dense(ch * h, use_bias=False, name="linear_k")(kv_x)
        v = nn.Dense(ch * h, use_bias=False, name="linear_v")(kv_x)
        q = q.reshape(q.shape[:-1] + (h, ch)) / math.sqrt(ch)
        k = k.reshape(k.shape[:-1] + (h, ch))
        v = v.reshape(v.shape[:-1] + (h, ch))
        # [*, H, Q, K]
        a = jnp.einsum("...qhc,...khc->...hqk", q, k)
        for b in biases:
            a = a + b
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("...hqk,...khc->...qhc", a, v)
        if self.gating:
            g = jax.nn.sigmoid(nn.Dense(ch * h, name="linear_g")(q_x))
            o = o * g.reshape(g.shape[:-1] + (h, ch))
        o = o.reshape(o.shape[:-2] + (h * ch,))
        return nn.Dense(self.c_q, kernel_init=nn.initializers.zeros,
                        name="linear_o")(o)


class TriangleMultiplication(nn.Module):
    """Algorithms 11/12 (triangular_multiplicative_update.py:26-130)."""

    c_z: int
    c_hidden: int
    outgoing: bool = True

    @nn.compact
    def __call__(self, z: Array, mask: Optional[Array] = None) -> Array:
        if mask is None:
            mask = jnp.ones(z.shape[:-1], z.dtype)
        mask = mask[..., None]
        z = nn.LayerNorm(epsilon=1e-5, name="layer_norm_in")(z)
        a = nn.Dense(self.c_hidden, name="linear_a_p")(z) * jax.nn.sigmoid(
            nn.Dense(self.c_hidden, name="linear_a_g")(z)
        )
        a = a * mask
        b = nn.Dense(self.c_hidden, name="linear_b_p")(z) * jax.nn.sigmoid(
            nn.Dense(self.c_hidden, name="linear_b_g")(z)
        )
        b = b * mask
        if self.outgoing:
            x = jnp.einsum("...ikc,...jkc->...ijc", a, b)
        else:
            x = jnp.einsum("...kic,...kjc->...ijc", a, b)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm_out")(x)
        x = nn.Dense(self.c_z, kernel_init=nn.initializers.zeros,
                     name="linear_z")(x)
        g = jax.nn.sigmoid(nn.Dense(self.c_z, name="linear_g")(z))
        return x * g


class PairTransition(nn.Module):
    """pair_transition.py:24-98."""

    c_z: int
    n: int

    @nn.compact
    def __call__(self, z: Array, mask: Optional[Array] = None) -> Array:
        if mask is None:
            mask = jnp.ones(z.shape[:-1], z.dtype)
        mask = mask[..., None]
        z = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(z)
        z = nn.relu(nn.Dense(self.n * self.c_z, name="linear_1")(z))
        return nn.Dense(self.c_z, kernel_init=nn.initializers.zeros,
                        name="linear_2")(z) * mask


class LightTemplatePairStackBlock(nn.Module):
    """template.py:240-330: per-template trimul + transition, final LN.

    z: (B, S_t, N, N, C_t), mask: (B, S_t or 1, N, N)."""

    c_t: int
    c_hidden_tri_mul: int
    pair_transition_n: int

    @nn.compact
    def __call__(self, z: Array, mask: Array) -> Array:
        tri_out = TriangleMultiplication(
            self.c_t, self.c_hidden_tri_mul, outgoing=True, name="tri_mul_out"
        )
        tri_in = TriangleMultiplication(
            self.c_t, self.c_hidden_tri_mul, outgoing=False, name="tri_mul_in"
        )
        trans = PairTransition(self.c_t, self.pair_transition_n,
                               name="pair_transition")
        if mask.shape[-3] == 1:
            mask = jnp.broadcast_to(mask, z.shape[:-1])
        # templates are processed independently; vectorize over S_t via the
        # batched primitives (the reference loops — same math)
        z = z + tri_out(z, mask)
        z = z + tri_in(z, mask)
        z = z + trans(z, mask)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(z)


class TemplatePointwiseAttention(nn.Module):
    """template.py:44-132 (Algorithm 17): per-pair attention over templates."""

    c_t: int
    c_z: int
    c_hidden: int
    no_heads: int
    inf: float = 1e9

    @nn.compact
    def __call__(self, t: Array, z: Array,
                 template_mask: Optional[Array] = None) -> Array:
        # t: (B, S_t, N, N, C_t); z: (B, N, N, C_z)
        if template_mask is None:
            template_mask = jnp.ones(t.shape[:-3], t.dtype)
        bias = self.inf * (template_mask[..., None, None, None, None, :] - 1.0)
        zq = z[..., None, :]  # (B, N, N, 1, C_z)
        tk = jnp.moveaxis(t, -4, -2)  # (B, N, N, S_t, C_t)
        out = GatedAttention(
            self.c_z, self.c_t, self.c_t, self.c_hidden, self.no_heads,
            gating=False, name="mha",
        )(zq, tk, biases=[bias])
        return out[..., 0, :]


class TemplateColumnWiseAttention(nn.Module):
    """score_network.py:353-383: per-residue attention over templates."""

    c_in: int
    c_hidden: int
    no_heads: int
    inf: float = 1e9

    @nn.compact
    def __call__(self, t: Array, s: Array, template_mask: Array) -> Array:
        # t: (B, S_t, N, C_s); s: (B, N, C_s)
        bias = self.inf * (template_mask[..., None, None, None, :] - 1.0)
        sq = s[..., None, :]  # (B, N, 1, C_s)
        tk = jnp.moveaxis(t, -3, -2)  # (B, N, S_t, C_s)
        out = GatedAttention(
            self.c_in, self.c_in, self.c_in, self.c_hidden, self.no_heads,
            gating=True, name="mha",
        )(sq, tk, biases=[bias])
        return out[..., 0, :]


class TemplateAngleEmbedder(nn.Module):
    """embedders.py:228-268."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(nn.Dense(self.c_out, name="linear_1")(x))
        return nn.Dense(self.c_out, name="linear_2")(x)


class TemplatePairEmbedder(nn.Module):
    """embedders.py:271-310."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.c_out, name="linear")(x)
