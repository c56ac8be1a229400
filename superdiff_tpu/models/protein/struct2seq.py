"""MPNN->ESM sequence conditioner (struct2seq) — Flax rebuild.

Reference: ``applications/proteins/Proteus/proteus_model/strcture2seq.py:1-133``
(class ``MPNN_ESM``) plus the two frozen externals it drives:

* CA-only ProteinMPNN
  (``Proteus/ProteinMPNN/protein_mpnn_utils.py:636-1258``): k-NN graph
  featurizer over CA coordinates, 3 message-passing encoder layers, 3
  autoregressive decoder layers sampling sequences in a random decode order.
  Rebuilt here with the sampling loop as one ``lax.scan`` over decode steps
  (static shapes; the torch version is a Python loop with scatter/gather).
* ESM2 (fair-esm / transformers ``EsmModel`` with rotary embeddings): the
  language model embedding each sampled sequence; all per-layer token
  representations and attention maps are consumed downstream.

Only the combiner heads (``esm_s_combine``, ``esm_p_combine``, ``esm_s_mlp``,
``esm_p_mlp``) are trained in the reference — its ``state_dict`` override
strips the frozen MPNN/ESM weights (strcture2seq.py:35-39), so Proteus
checkpoints carry just these four. The MPNN checkpoint (v_48_020.pt) and the
ESM2 weights are loaded separately (gated: no network egress here, so both
converters accept local files only).

Contract (strcture2seq.py:88-133): single chain, no structure padding — the
reference raises on either; we assert the same.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import residue_constants as rc

Array = jax.Array

# ProteinMPNN's 21-letter alphabet (protein_mpnn_utils.py:207)
MPNN_ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"

# fair-esm standard alphabet (esm.Alphabet.standard vocabulary; the
# transformers ESM checkpoints use the same vocab ordering)
ESM_TOKENS = (
    ["<cls>", "<pad>", "<eos>", "<unk>"]
    + list("LAGVSERTIDPKQNFYMHWCXBUZO") + [".", "-", "<null_1>", "<mask>"]
)
ESM_CLS, ESM_PAD, ESM_EOS = 0, 1, 2
ESM_MASK = len(ESM_TOKENS) - 1

# AF2 aatype -> MPNN alphabet index (strcture2seq.py:100-113 goes through
# letter strings; precomputed here)
AF_TO_MPNN = np.array(
    [MPNN_ALPHABET.index(letter) for letter in rc.restypes_with_x], np.int32
)
# MPNN index (+1 shifted, 0 = padding) -> ESM token (strcture2seq.py:41-47)
MPNN_TO_ESM = np.array(
    [ESM_PAD] + [ESM_TOKENS.index(letter) for letter in MPNN_ALPHABET], np.int32
)


# ---------------------------------------------------------------------------
# CA-only ProteinMPNN
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MPNNConfig:
    """ProteinMPNN hyperparameters (strcture2seq.py:17: num_letters=21,
    node/edge 128, hidden 128, 3+3 layers, k from ckpt['num_edges'])."""

    node_features: int = 128
    edge_features: int = 128
    hidden_dim: int = 128
    num_letters: int = 21
    vocab: int = 21
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    k_neighbors: int = 48  # v_48_020.pt
    num_rbf: int = 16
    num_positional_embeddings: int = 16
    max_relative_feature: int = 32
    scale: float = 30.0  # message-sum normalizer

    @staticmethod
    def tiny() -> "MPNNConfig":
        return MPNNConfig(node_features=16, edge_features=16, hidden_dim=16,
                          num_encoder_layers=2, num_decoder_layers=2,
                          k_neighbors=6, num_rbf=4,
                          num_positional_embeddings=4)


def gather_nodes(nodes: Array, idx: Array) -> Array:
    """[B,N,C] at [B,N,K] -> [B,N,K,C] (protein_mpnn_utils.py:614-622)."""
    return jnp.take_along_axis(nodes[:, :, None, :], idx[..., None], axis=1)


def cat_neighbors_nodes(h_nodes: Array, h_neighbors: Array, e_idx: Array) -> Array:
    return jnp.concatenate([h_neighbors, gather_nodes(h_nodes, e_idx)], -1)


def _normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize semantics (zero vectors stay zero)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _quaternions(r: Array) -> Array:
    """Rotation matrices [...,3,3] -> unit quaternions [...,4]
    (protein_mpnn_utils.py:816-843)."""
    diag = jnp.diagonal(r, axis1=-2, axis2=-1)
    rxx, ryy, rzz = diag[..., 0], diag[..., 1], diag[..., 2]
    magnitudes = 0.5 * jnp.sqrt(
        jnp.abs(1.0 + jnp.stack([rxx - ryy - rzz, -rxx + ryy - rzz,
                                 -rxx - ryy + rzz], -1))
    )
    signs = jnp.sign(
        jnp.stack([r[..., 2, 1] - r[..., 1, 2], r[..., 0, 2] - r[..., 2, 0],
                   r[..., 1, 0] - r[..., 0, 1]], -1)
    )
    xyz = signs * magnitudes
    w = jnp.sqrt(nn.relu(1.0 + diag.sum(-1, keepdims=True))) / 2.0
    return _normalize(jnp.concatenate([xyz, w], -1))


class PositionalEncodings(nn.Module):
    """protein_mpnn_utils.py:779-792."""

    num_embeddings: int
    max_relative_feature: int = 32

    @nn.compact
    def __call__(self, offset: Array, mask: Array) -> Array:
        mr = self.max_relative_feature
        d = jnp.clip(offset + mr, 0, 2 * mr) * mask + (1 - mask) * (2 * mr + 1)
        return nn.Dense(self.num_embeddings, name="linear")(
            jax.nn.one_hot(d, 2 * mr + 2)
        )


class CAProteinFeatures(nn.Module):
    """CA k-NN graph featurizer (protein_mpnn_utils.py:794-971): 9 RBF
    distance maps over the (prev, self, next) CA triplet, local-frame
    orientation quaternions + unit vectors, relative-position encodings."""

    cfg: MPNNConfig

    @nn.compact
    def __call__(self, ca: Array, mask: Array, residue_idx: Array,
                 chain_labels: Array) -> Tuple[Array, Array]:
        cfg = self.cfg
        b, n, _ = ca.shape
        k = min(cfg.k_neighbors, n)

        # pairwise distances + kNN (includes self at distance 0)
        mask_2d = mask[:, :, None] * mask[:, None, :]
        d_full = mask_2d * jnp.sqrt(
            jnp.sum((ca[:, :, None] - ca[:, None, :]) ** 2, -1) + 1e-6
        )
        d_max = jnp.max(d_full, -1, keepdims=True)
        d_adjust = d_full + (1.0 - mask_2d) * d_max
        neg_d, e_idx = jax.lax.top_k(-d_adjust, k)
        d_neighbors = -neg_d

        # shifted coordinate triplet (Ca_0 = prev, Ca_2 = next; zeros at ends)
        ca0 = jnp.pad(ca[:, :-1], ((0, 0), (1, 0), (0, 0)))
        ca2 = jnp.pad(ca[:, 1:], ((0, 0), (0, 1), (0, 0)))

        def rbf(d):
            d_mu = jnp.linspace(2.0, 22.0, cfg.num_rbf)
            d_sigma = (22.0 - 2.0) / cfg.num_rbf
            return jnp.exp(-(((d[..., None] - d_mu) / d_sigma) ** 2))

        def get_rbf(a, bb):
            dab = jnp.sqrt(jnp.sum((a[:, :, None] - bb[:, None, :]) ** 2, -1)
                           + 1e-6)
            return rbf(jnp.take_along_axis(dab, e_idx, axis=2))

        rbf_all = jnp.concatenate(
            [rbf(d_neighbors), get_rbf(ca0, ca0), get_rbf(ca2, ca2),
             get_rbf(ca0, ca), get_rbf(ca0, ca2), get_rbf(ca, ca0),
             get_rbf(ca, ca2), get_rbf(ca2, ca0), get_rbf(ca2, ca)], -1,
        )

        # local backbone frames + relative orientations (lines 845-891)
        dx = ca[:, 1:] - ca[:, :-1]
        dx_norm = jnp.linalg.norm(dx, axis=-1)
        dx = dx * ((dx_norm > 3.6) & (dx_norm < 4.0))[..., None]
        u = _normalize(dx)
        u_2, u_1 = u[:, :-2], u[:, 1:-1]
        n_2 = _normalize(jnp.cross(u_2, u_1))
        o_1 = _normalize(u_2 - u_1)
        o_mat = jnp.stack([o_1, n_2, jnp.cross(o_1, n_2)], 2)  # (B,N-3,3,3)
        o_flat = jnp.pad(o_mat.reshape(b, n - 3, 9),
                         ((0, 0), (1, 2), (0, 0)))
        o_neighbors = gather_nodes(o_flat, e_idx).reshape(b, n, k, 3, 3)
        x_neighbors = gather_nodes(ca, e_idx)
        o_mat = o_flat.reshape(b, n, 3, 3)
        du = _normalize(
            jnp.einsum("bnij,bnkj->bnki", o_mat, x_neighbors - ca[:, :, None])
        )
        r_rel = jnp.einsum("bnji,bnkjl->bnkil", o_mat, o_neighbors)
        o_features = jnp.concatenate([du, _quaternions(r_rel)], -1)  # (B,N,K,7)

        offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        offset = jnp.take_along_axis(offset, e_idx, axis=2)
        d_chains = (chain_labels[:, :, None] == chain_labels[:, None, :]
                    ).astype(jnp.int32)
        e_chains = jnp.take_along_axis(d_chains, e_idx, axis=2)
        e_positional = PositionalEncodings(
            cfg.num_positional_embeddings, cfg.max_relative_feature,
            name="embeddings",
        )(offset, e_chains)
        e = jnp.concatenate([e_positional, rbf_all, o_features], -1)
        e = nn.Dense(cfg.edge_features, use_bias=False, name="edge_embedding")(e)
        e = nn.LayerNorm(epsilon=1e-5, name="norm_edges")(e)
        return e, e_idx


class _PositionWiseFFN(nn.Module):
    num_hidden: int
    num_ff: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.num_hidden, name="W_out")(
            nn.gelu(nn.Dense(self.num_ff, name="W_in")(x), approximate=False)
        )


class MPNNEncLayer(nn.Module):
    """protein_mpnn_utils.py:636-713 (inference: dropout = identity)."""

    num_hidden: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_v, h_e, e_idx, mask_v, mask_attend):
        h = self.num_hidden
        h_ev = cat_neighbors_nodes(h_v, h_e, e_idx)
        h_ev = jnp.concatenate(
            [jnp.broadcast_to(h_v[:, :, None], h_ev.shape[:3] + (h,)), h_ev], -1
        )
        gelu = lambda x: nn.gelu(x, approximate=False)
        m = nn.Dense(h, name="W3")(gelu(nn.Dense(h, name="W2")(
            gelu(nn.Dense(h, name="W1")(h_ev)))))
        m = mask_attend[..., None] * m
        h_v = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            h_v + jnp.sum(m, -2) / self.scale
        )
        h_v = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            h_v + _PositionWiseFFN(h, h * 4, name="dense")(h_v)
        )
        h_v = mask_v[..., None] * h_v

        h_ev = cat_neighbors_nodes(h_v, h_e, e_idx)
        h_ev = jnp.concatenate(
            [jnp.broadcast_to(h_v[:, :, None], h_ev.shape[:3] + (h,)), h_ev], -1
        )
        m = nn.Dense(h, name="W13")(gelu(nn.Dense(h, name="W12")(
            gelu(nn.Dense(h, name="W11")(h_ev)))))
        h_e = nn.LayerNorm(epsilon=1e-5, name="norm3")(h_e + m)
        return h_v, h_e


class MPNNDecLayer(nn.Module):
    """protein_mpnn_utils.py:716-765."""

    num_hidden: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_v, h_e, mask_v=None):
        h = self.num_hidden
        h_ev = jnp.concatenate(
            [jnp.broadcast_to(h_v[:, :, None], h_e.shape[:3] + (h,)), h_e], -1
        )
        gelu = lambda x: nn.gelu(x, approximate=False)
        m = nn.Dense(h, name="W3")(gelu(nn.Dense(h, name="W2")(
            gelu(nn.Dense(h, name="W1")(h_ev)))))
        h_v = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            h_v + jnp.sum(m, -2) / self.scale
        )
        h_v = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            h_v + _PositionWiseFFN(h, h * 4, name="dense")(h_v)
        )
        if mask_v is not None:
            h_v = mask_v[..., None] * h_v
        return h_v


class ProteinMPNNCA(nn.Module):
    """CA-only ProteinMPNN (protein_mpnn_utils.py:1074-1258) with the decode
    loop factored into per-step methods so sampling runs as one lax.scan
    (see :func:`mpnn_sample`)."""

    cfg: MPNNConfig

    def setup(self):
        cfg = self.cfg
        # torch arg order quirk: CA_ProteinFeatures(edge_features=node_f,
        # node_features=edge_f) — both 128 so inert, kept for fidelity
        self.features = CAProteinFeatures(cfg)
        # (the torch model also declares W_v / node_embedding / norm_nodes;
        # all unused in forward — h_V starts from zeros — so no params here)
        self.W_e = nn.Dense(cfg.hidden_dim)
        self.W_s = nn.Embed(cfg.vocab, cfg.hidden_dim)
        self.encoder_layers = [
            MPNNEncLayer(cfg.hidden_dim, cfg.scale) for _ in
            range(cfg.num_encoder_layers)
        ]
        self.decoder_layers = [
            MPNNDecLayer(cfg.hidden_dim, cfg.scale) for _ in
            range(cfg.num_decoder_layers)
        ]
        self.W_out = nn.Dense(cfg.num_letters)

    def encode(self, ca, mask, residue_idx, chain_labels):
        e, e_idx = self.features(ca, mask, residue_idx, chain_labels)
        h_v = jnp.zeros(e.shape[:2] + (e.shape[-1],), e.dtype)
        h_e = self.W_e(e)
        mask_attend = mask[:, :, None] * gather_nodes(
            mask[..., None], e_idx
        )[..., 0]
        for layer in self.encoder_layers:
            h_v, h_e = layer(h_v, h_e, e_idx, mask, mask_attend)
        return h_v, h_e, e_idx

    def embed_seq(self, s):
        return self.W_s(s)

    def logits(self, h_v):
        return self.W_out(h_v)

    def decode_layer(self, l: int, h_v, h_esv, mask_v=None):
        return self.decoder_layers[l](h_v, h_esv, mask_v)

    def sample(self, key: Array, ca: Array, mask: Array, residue_idx: Array,
               chain_labels: Array, s_true: Array, chain_mask: Array, *,
               temperature: float = 0.1, omit_aas: str = "CX") -> Array:
        """Autoregressive sampling (protein_mpnn_utils.py:1159-1258) as one
        ``nn.scan`` over decode steps (params broadcast — the torch version
        is a Python loop with scatter/gather). Returns sampled MPNN-alphabet
        indices (B, N). ``chain_mask`` positions get sampled; others copy
        ``s_true``."""
        cfg = self.cfg
        b, n = s_true.shape
        key_order, key_steps = jax.random.split(key)
        h_v, h_e, e_idx = self.encode(ca, mask, residue_idx, chain_labels)
        chain_mask = chain_mask * mask
        randn = jax.random.normal(key_order, (b, n))
        decoding_order = jnp.argsort((chain_mask + 1e-4) * jnp.abs(randn),
                                     axis=-1)
        mask_bw, mask_fw = decode_masks(decoding_order, e_idx, mask)

        h_ex_encoder = cat_neighbors_nodes(jnp.zeros_like(h_v), h_e, e_idx)
        h_exv_encoder_fw = mask_fw * cat_neighbors_nodes(h_v, h_ex_encoder,
                                                         e_idx)

        omit = jnp.asarray([aa in omit_aas for aa in MPNN_ALPHABET],
                           jnp.float32)
        n_dec = cfg.num_decoder_layers
        h_v_stack0 = jnp.concatenate(
            [h_v[None], jnp.zeros((n_dec,) + h_v.shape, h_v.dtype)], 0
        )
        bi = jnp.arange(b)

        def body(mdl, carry, _):
            h_s, h_v_stack, s_out, i = carry
            t = decoding_order[:, i]  # (B,)
            step_key = jax.random.fold_in(key_steps, i)

            take1 = lambda x, ax=1: jnp.take_along_axis(
                x, t.reshape((b,) + (1,) * (x.ndim - 1)), axis=ax
            )
            e_idx_t = take1(e_idx)  # (B,1,K)
            h_e_t = take1(h_e)  # (B,1,K,H)
            h_es_t = cat_neighbors_nodes(h_s, h_e_t, e_idx_t)
            h_exv_t = take1(h_exv_encoder_fw)
            mask_bw_t = take1(mask_bw)
            mask_t = take1(mask, ax=1)[:, 0]  # (B,)

            h_v_l = h_v_stack
            for l in range(n_dec):
                h_esv_dec_t = cat_neighbors_nodes(h_v_l[l], h_es_t, e_idx_t)
                h_v_t = take1(h_v_l[l])  # (B,1,H)
                h_esv_t = mask_bw_t * h_esv_dec_t + h_exv_t
                new_h = mdl.decode_layer(l, h_v_t, h_esv_t, mask_t[:, None])
                h_v_l = h_v_l.at[l + 1, bi, t].set(new_h[:, 0])

            h_v_last = h_v_l[n_dec][bi, t]  # (B,H)
            logits = mdl.logits(h_v_last) / temperature
            logits = logits - 1e8 * omit[None, :]
            s_t = jax.random.categorical(step_key, logits, axis=-1)  # (B,)

            cm_t = chain_mask[bi, t]
            s_t = (s_t * cm_t + s_true[bi, t] * (1.0 - cm_t)).astype(jnp.int32)
            emb = mdl.embed_seq(s_t)  # (B,H)
            h_s = h_s.at[bi, t].set(emb)
            s_out = s_out.at[bi, t].set(s_t)
            return (h_s, h_v_l, s_out, i + 1), None

        carry0 = (jnp.zeros_like(h_v), h_v_stack0,
                  jnp.zeros((b, n), jnp.int32), jnp.int32(0))
        scan = nn.scan(body, variable_broadcast="params", split_rngs={},
                       length=n)
        (_, _, s_out, _), _ = scan(self, carry0, None)
        return s_out

    def __call__(self, ca, s, mask, chain_m, residue_idx, chain_labels,
                 decoding_order):
        """Teacher-forced log-probs (protein_mpnn_utils.py:1112-1156), used
        for numerical parity testing against the reference torch forward."""
        cfg = self.cfg
        h_v, h_e, e_idx = self.encode(ca, mask, residue_idx, chain_labels)
        h_s = self.embed_seq(s)
        h_es = cat_neighbors_nodes(h_s, h_e, e_idx)
        h_ex_encoder = cat_neighbors_nodes(jnp.zeros_like(h_s), h_e, e_idx)
        h_exv_encoder = cat_neighbors_nodes(h_v, h_ex_encoder, e_idx)

        mask_bw, mask_fw = decode_masks(decoding_order, e_idx, mask)
        h_exv_encoder_fw = mask_fw * h_exv_encoder
        for layer in self.decoder_layers:
            h_esv = cat_neighbors_nodes(h_v, h_es, e_idx)
            h_esv = mask_bw * h_esv + h_exv_encoder_fw
            h_v = layer(h_v, h_esv, mask)
        return jax.nn.log_softmax(self.logits(h_v), -1)


def decode_masks(decoding_order: Array, e_idx: Array, mask: Array):
    """Backward/forward attention masks for a decode order
    (protein_mpnn_utils.py:1137-1146): neighbor j is 'backward' for i iff j
    decodes strictly before i."""
    rank = jnp.argsort(decoding_order, axis=-1)  # rank[q] = decode position
    omb = (rank[:, :, None] > rank[:, None, :]).astype(jnp.float32)
    mask_attend = jnp.take_along_axis(omb, e_idx, axis=2)[..., None]
    mask_1d = mask[:, :, None, None]
    return mask_1d * mask_attend, mask_1d * (1.0 - mask_attend)


def mpnn_sample(
    model: ProteinMPNNCA,
    params,
    key: Array,
    ca: Array,
    mask: Array,
    residue_idx: Array,
    chain_labels: Array,
    s_true: Array,
    chain_mask: Array,
    *,
    temperature: float = 0.1,
    omit_aas: str = "CX",
) -> Array:
    """Functional wrapper over :meth:`ProteinMPNNCA.sample` for standalone
    (non-MPNNESM) use."""
    return model.apply(
        {"params": params}, key, ca, mask, residue_idx, chain_labels,
        s_true, chain_mask, temperature=temperature, omit_aas=omit_aas,
        method=ProteinMPNNCA.sample,
    )


# ---------------------------------------------------------------------------
# ESM2
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    """ESM2 transformer (defaults = esm2_t33_650M_UR50D,
    strcture2seq.py:12)."""

    vocab_size: int = 33
    embed_dim: int = 1280
    num_layers: int = 33
    attention_heads: int = 20
    intermediate_dim: int = 5120
    token_dropout: bool = True
    # fair-esm's ESM1bLayerNorm is torch nn.LayerNorm (eps 1e-5); note the
    # transformers EsmConfig *default* is 1e-12 — real HF snapshots pin it
    # in config.json, so loaders should forward that value here
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny() -> "ESM2Config":
        return ESM2Config(embed_dim=32, num_layers=2, attention_heads=4,
                          intermediate_dim=64)


def _rotary(x: Array) -> Array:
    """GPT-NeoX-style rotary embedding over the full head dim (ESM2's
    RotaryEmbedding / transformers EsmSelfAttention)."""
    b, h, t, d = x.shape
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    # fair-esm duplicates the frequency table (cat(freqs, freqs)) rather than
    # interleaving
    cos = jnp.cos(jnp.concatenate([ang, ang], -1))[None, None]
    sin = jnp.sin(jnp.concatenate([ang, ang], -1))[None, None]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], -1)
    return x * cos + rot * sin


class ESM2Layer(nn.Module):
    """Pre-LN transformer block with rotary attention."""

    cfg: ESM2Config

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        cfg = self.cfg
        h, d = cfg.attention_heads, cfg.embed_dim // cfg.attention_heads
        b, t, _ = x.shape
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(x)

        def split(z):
            return z.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        q = split(nn.Dense(cfg.embed_dim, name="q")(y)) * (d ** -0.5)
        k = split(nn.Dense(cfg.embed_dim, name="k")(y))
        v = split(nn.Dense(cfg.embed_dim, name="v")(y))
        q, k = _rotary(q), _rotary(k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, cfg.embed_dim)
        x = x + nn.Dense(cfg.embed_dim, name="out")(ctx)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_ln")(x)
        y = nn.Dense(cfg.intermediate_dim, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        x = x + nn.Dense(cfg.embed_dim, name="fc2")(y)
        return x, attn


class ESM2(nn.Module):
    """Token-level ESM2: returns all per-layer representations and
    attention maps (the two streams MPNN_ESM consumes,
    strcture2seq.py:60-86)."""

    cfg: ESM2Config

    @nn.compact
    def __call__(self, tokens: Array) -> dict:
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                     name="embed_tokens")(tokens).astype(cfg.dtype)
        if cfg.token_dropout:
            # inference-time rescale: (1 - 0.15*0.8) / (1 - observed ratio)
            x = jnp.where((tokens == ESM_MASK)[..., None], 0.0, x)
            lengths = jnp.sum(tokens != ESM_PAD, -1)
            ratio = jnp.sum(tokens == ESM_MASK, -1) / jnp.maximum(lengths, 1)
            x = x * ((1.0 - 0.15 * 0.8) / (1.0 - ratio))[:, None, None]
        reps = [x]
        attns = []
        for i in range(cfg.num_layers):
            x, attn = ESM2Layer(cfg, name=f"layer_{i}")(x)
            reps.append(x)
            attns.append(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_layer_norm_after")(x)
        reps[-1] = x  # fair-esm representations[num_layers] is post-final-LN
        return {
            "representations": jnp.stack(reps, 2),  # (B, T, L+1, C)
            "attentions": jnp.stack(attns, 1),  # (B, L, H, T, T)
        }


# ---------------------------------------------------------------------------
# MPNN_ESM combiner
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MPNNESMConfig:
    c_s: int = 256
    c_z: int = 128
    temperature: float = 0.1
    seq_nums: int = 4
    mpnn: MPNNConfig = MPNNConfig()
    esm: ESM2Config = ESM2Config()

    @staticmethod
    def tiny(c_s: int = 32, c_z: int = 16) -> "MPNNESMConfig":
        return MPNNESMConfig(c_s=c_s, c_z=c_z, seq_nums=2,
                             mpnn=MPNNConfig.tiny(), esm=ESM2Config.tiny())


class MPNNESM(nn.Module):
    """strcture2seq.py MPNN_ESM: sample ``seq_nums`` sequences for the
    self-condition structure with ProteinMPNN, embed each with ESM2, combine
    layer representations with a learned softmax and project to (c_s, c_z).

    Returns ``esm_s`` (B, S, N, c_s) and ``esm_p`` (B, S, N, N, c_z) shaped
    as template stacks for the struct2seq TemplateCrossEmbedder.

    Needs a ``struct2seq`` RNG stream for the MPNN decode order + draws
    (pass ``rngs={"struct2seq": key}``)."""

    cfg: MPNNESMConfig

    def setup(self):
        cfg = self.cfg
        self.mpnn_model = ProteinMPNNCA(cfg.mpnn)
        self.esm = ESM2(cfg.esm)
        nl = cfg.esm.num_layers
        self.esm_s_combine = self.param(
            "esm_s_combine", nn.initializers.zeros, (nl + 1,)
        )
        # declared-but-unused in the reference forward (strcture2seq.py:26);
        # kept for checkpoint compatibility
        self.esm_p_combine = self.param(
            "esm_p_combine", nn.initializers.zeros, (nl,)
        )
        self.esm_s_mlp_ln = nn.LayerNorm(epsilon=1e-5)
        self.esm_s_mlp_0 = nn.Dense(cfg.c_s)
        self.esm_s_mlp_1 = nn.Dense(cfg.c_s)
        self.esm_p_mlp = nn.Dense(cfg.c_z)

    def __call__(self, self_condition: dict) -> Tuple[Array, Array]:
        cfg = self.cfg
        ca = self_condition["final_atom_positions"][:, :, rc.CA_IDX, :]
        b, n = ca.shape[:2]
        # composition sc dicts carry only atoms+mask; the reference's
        # init_feat default sequence is all-ALA (fold_module.py:551+)
        aatype = self_condition.get("aatype")
        if aatype is None:
            aatype = jnp.zeros((b, n), jnp.int32)
        mask = jnp.ones((b, n), jnp.float32)  # reference raises on padding
        residue_idx = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
        chain_labels = jnp.zeros((b, n), jnp.int32)
        s_true = jnp.asarray(AF_TO_MPNN)[aatype]

        key = (self.make_rng("struct2seq")
               if self.has_rng("struct2seq") else jax.random.PRNGKey(0))
        mpnn_to_esm = jnp.asarray(MPNN_TO_ESM)

        esm_s_all, esm_p_all = [], []
        for i in range(cfg.seq_nums):
            s = self._sample_one(jax.random.fold_in(key, i), ca, mask,
                                 residue_idx, chain_labels, s_true)
            # MPNN idx -> ESM tokens with bos/eos (strcture2seq.py:55-76)
            esmaa = mpnn_to_esm[(s + 1) * mask.astype(jnp.int32)]
            tokens = jnp.concatenate(
                [jnp.full((b, 1), ESM_CLS, jnp.int32), esmaa,
                 jnp.full((b, 1), ESM_PAD, jnp.int32)], 1,
            )
            eos_pos = jnp.sum(tokens != ESM_PAD, 1)
            tokens = tokens.at[jnp.arange(b), eos_pos].set(ESM_EOS)
            out = self.esm(tokens)
            reps = out["representations"][:, 1:-1]  # (B, N, L+1, C)
            attn = out["attentions"][..., 1:-1, 1:-1]  # (B, L, H, N, N)
            nl, nh = cfg.esm.num_layers, cfg.esm.attention_heads
            esm_p = attn.reshape(b, nl * nh, n, n).transpose(0, 2, 3, 1)
            esm_s_all.append(reps.astype(jnp.float32))
            esm_p_all.append(esm_p.astype(jnp.float32))

        esm_s = jnp.stack(esm_s_all, 1)  # (B, S, N, L+1, C)
        esm_p = jnp.stack(esm_p_all, 1)  # (B, S, N, N, L*H)
        w = jax.nn.softmax(self.esm_s_combine, 0)
        esm_s = jnp.einsum("l,bsnlc->bsnc", w, esm_s)
        esm_s = self.esm_s_mlp_1(nn.relu(self.esm_s_mlp_0(
            self.esm_s_mlp_ln(esm_s))))
        esm_p = self.esm_p_mlp(esm_p)
        return esm_s, esm_p

    def _sample_one(self, key, ca, mask, residue_idx, chain_labels, s_true):
        if self.is_initializing():
            # during init run the teacher-forced forward once to create the
            # MPNN params (same param set as the sampling path)
            _ = self.mpnn_model(ca, s_true, mask, mask, residue_idx,
                                chain_labels, residue_idx)
            return s_true
        return self.mpnn_model.sample(
            key, ca, mask, residue_idx, chain_labels, s_true, mask,
            temperature=self.cfg.temperature,
        )


# ---------------------------------------------------------------------------
# Loading + injection into Proteus
# ---------------------------------------------------------------------------


def init_mpnn_esm(cfg: MPNNESMConfig, key: Array):
    """Initialize an MPNNESM tree at minimal spatial size (param shapes are
    length-independent). Returns (model, params)."""
    model = MPNNESM(cfg)
    b, n = 1, 8
    sc = {
        "aatype": jnp.zeros((b, n), jnp.int32),
        "final_atom_positions": jnp.linspace(0.0, 1.0, b * n * 37 * 3)
        .reshape(b, n, 37, 3) * 30.0,
    }
    params = jax.jit(model.init)({"params": key, "struct2seq": key}, sc)
    return model, params["params"]


def load_mpnn_esm(
    proteus_sd: dict,
    *,
    c_s: int = 256,
    c_z: int = 128,
    mpnn_ckpt: Optional[str] = None,
    esm_sd: Optional[dict] = None,
    esm_cfg: Optional[ESM2Config] = None,
    temperature: float = 0.1,
    seq_nums: int = 4,
    seed: int = 0,
):
    """Assemble a weight-loaded MPNN_ESM from its three sources:

    * combiner heads — from the Proteus checkpoint state_dict (the only
      tensors MPNN_ESM contributes there, strcture2seq.py:34-37);
    * frozen ProteinMPNN — ``mpnn_ckpt`` path (v_48_020.pt format);
    * frozen ESM2 — a transformers ``EsmModel`` state_dict (numpy), e.g.
      from a local facebook/esm2_t33_650M_UR50D snapshot (weights gated:
      no network egress here).

    Frozen parts without a provided source stay randomly initialized with a
    loud warning — head-only loading still lets the conditioned forward
    execute end-to-end. Returns (model, params).
    """
    import warnings

    from . import convert as pconvert

    mpnn_cfg = MPNNConfig()
    mpnn_sd = None
    if mpnn_ckpt is not None:
        mpnn_sd, k = pconvert.load_mpnn_checkpoint(mpnn_ckpt)
        mpnn_cfg = dataclasses.replace(mpnn_cfg, k_neighbors=k)
    cfg = MPNNESMConfig(
        c_s=c_s, c_z=c_z, temperature=temperature, seq_nums=seq_nums,
        mpnn=mpnn_cfg, esm=esm_cfg or ESM2Config(),
    )
    model, params = init_mpnn_esm(cfg, jax.random.PRNGKey(seed))
    params = jax.tree_util.tree_map(np.asarray, params)

    heads = pconvert.extract_struct2seq_heads(proteus_sd)
    if heads:
        params, _ = pconvert.apply_mpnn_esm_heads(params, heads)
    else:
        warnings.warn("Proteus checkpoint carries no struct2seq combiner "
                      "heads; MPNN_ESM heads stay random", stacklevel=2)
    if mpnn_sd is not None:
        params["mpnn_model"], _ = pconvert.apply_mpnn_state_dict(
            params["mpnn_model"], mpnn_sd, cfg.mpnn
        )
    else:
        warnings.warn("no ProteinMPNN checkpoint provided; MPNN stays "
                      "random", stacklevel=2)
    if esm_sd is not None:
        params["esm"], _ = pconvert.apply_esm2_state_dict(
            params["esm"], esm_sd, cfg.esm
        )
    else:
        warnings.warn("no ESM2 weights provided; ESM tower stays random",
                      stacklevel=2)
    return model, params


def make_struct2seq_fn(model: MPNNESM, params, seed: int = 0):
    """Wrap (model, params) as the ``struct2seq_fn`` callable Proteus
    injects (proteus.py ``EmbeddingLayer.struct2seq_fn``): maps a
    self-condition dict to (esm_s, esm_p).

    The MPNN decode order/draws use a fixed fold-in of ``seed`` — inside a
    jitted sampler every flagged step sees the same stream, mirroring the
    reference's single torch generator."""
    frozen = jax.tree_util.tree_map(jnp.asarray, params)
    key = jax.random.PRNGKey(seed)

    def fn(self_condition: dict):
        return model.apply({"params": frozen}, self_condition,
                           rngs={"struct2seq": key})

    return fn
