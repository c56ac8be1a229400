"""Weight-compatible FrameDiff SE(3) score network (Flax).

Architecturally faithful rebuild of the reference FrameDiff model so its
published torch checkpoints load and reproduce the same function:

* ``se3diff_model/score_network.py:50-216`` — Embedder (node/edge MLP stacks)
  and ScoreNetwork forward (mask handling, psi gating).
* ``se3diff_model/ipa_pytorch.py:236-473`` — InvariantPointAttention, incl.
  the reference's quirks: split-stack [all-x, all-y, all-z] point layout,
  sqrt(1/(3 c_hidden)) / sqrt(1/3) logit scales, softplus head weights scaled
  by sqrt(1/(3 (P_q 9/2))), o_feats concat order (scalar, x, y, z, norms,
  pair), and the vestigial ``linear_rbf`` (present in checkpoints, unused).
* ``ipa_pytorch.py:559-668`` — IpaScore trunk: per block IPA -> post-LN ->
  [node ++ skip_embed(init)] -> 2-layer post-norm torch TransformerEncoder ->
  post_tfmr -> StructureModuleTransition -> BackboneUpdate via quaternion
  update vectors (openfold ``compose_q_update_vec``), edge transition on all
  but the last block; rot score from scaled rigids, trans score after
  unscaling.

The parameter tree mirrors the torch module names one-to-one so
``models/protein/convert.py`` maps ``state_dict`` keys mechanically;
``tests/test_framediff_parity.py`` checks numerical agreement against the
reference torch implementation executed from /root/reference (read-only).

This file is the *checkpoint-faithful* path; ``ipa.py`` remains the
TPU-idiomatic trainable variant used by ``train/se3_trainer.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import rigid

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FrameDiffConfig:
    """Mirrors the reference ``model:`` config (config/base.yaml, resolved)."""

    node_embed_size: int = 256
    edge_embed_size: int = 128
    index_embed_size: int = 32
    embed_self_conditioning: bool = True
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0
    c_hidden: int = 256
    c_skip: int = 64
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    seq_tfmr_num_heads: int = 4
    seq_tfmr_num_layers: int = 2
    num_blocks: int = 4
    coordinate_scaling: float = 0.1

    @staticmethod
    def tiny() -> "FrameDiffConfig":
        return FrameDiffConfig(
            node_embed_size=32, edge_embed_size=16, index_embed_size=8,
            num_bins=22, c_hidden=16, c_skip=8, no_heads=2, no_qk_points=2,
            no_v_points=3, seq_tfmr_num_heads=2, seq_tfmr_num_layers=1,
            num_blocks=2,
        )

    @staticmethod
    def from_ckpt_conf(model_conf: dict) -> "FrameDiffConfig":
        """Build from a checkpoint-embedded ``conf.model`` dict (the reference
        merges it over the file config, ``inference_se3_diffusion.py:140-141``)."""
        embed = model_conf.get("embed", {})
        ipa = model_conf.get("ipa", {})
        return FrameDiffConfig(
            node_embed_size=int(model_conf.get("node_embed_size", 256)),
            edge_embed_size=int(model_conf.get("edge_embed_size", 128)),
            index_embed_size=int(embed.get("index_embed_size", 32)),
            embed_self_conditioning=bool(embed.get("embed_self_conditioning", True)),
            num_bins=int(embed.get("num_bins", 22)),
            min_bin=float(embed.get("min_bin", 1e-5)),
            max_bin=float(embed.get("max_bin", 20.0)),
            c_hidden=int(ipa.get("c_hidden", 256)),
            c_skip=int(ipa.get("c_skip", 64)),
            no_heads=int(ipa.get("no_heads", 8)),
            no_qk_points=int(ipa.get("no_qk_points", 8)),
            no_v_points=int(ipa.get("no_v_points", 12)),
            seq_tfmr_num_heads=int(ipa.get("seq_tfmr_num_heads", 4)),
            seq_tfmr_num_layers=int(ipa.get("seq_tfmr_num_layers", 2)),
            num_blocks=int(ipa.get("num_blocks", 4)),
            coordinate_scaling=float(ipa.get("coordinate_scaling", 0.1)),
        )


def timestep_embedding(t: Array, dim: int, max_positions: int = 10_000) -> Array:
    """``score_network.get_timestep_embedding``: t is scaled by max_positions
    first; [sin, cos] order."""
    tt = t * max_positions
    half = dim // 2
    emb = math.log(max_positions) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = tt.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def index_embedding(indices: Array, embed_size: int, max_len: int = 2056) -> Array:
    """``score_network.get_index_embedding``: note the pi factor."""
    k = jnp.arange(embed_size // 2, dtype=jnp.float32)
    scale = indices[..., None].astype(jnp.float32) * jnp.pi / (
        max_len ** (2.0 * k / embed_size)
    )
    return jnp.concatenate([jnp.sin(scale), jnp.cos(scale)], axis=-1)


def calc_distogram(pos: Array, min_bin: float, max_bin: float, num_bins: int) -> Array:
    """``se3diff_data/utils.py:570-580``: open-interval bin membership."""
    d = jnp.linalg.norm(pos[:, :, None, :] - pos[:, None, :, :], axis=-1)[..., None]
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.full((1,), 1e8)], axis=-1)
    return ((d > lower) * (d < upper)).astype(pos.dtype)


class _MLP3LN(nn.Module):
    """Linear-ReLU-Linear-ReLU-Linear-LayerNorm stack (node/edge embedder)."""

    width: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.width, name="linear_0")(x)
        x = nn.Dense(self.width, name="linear_1")(nn.relu(x))
        x = nn.Dense(self.width, name="linear_2")(nn.relu(x))
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class Embedder(nn.Module):
    """``score_network.Embedder`` (lines 50-152)."""

    cfg: FrameDiffConfig

    @nn.compact
    def __call__(self, seq_idx, t, fixed_mask, sc_ca_t):
        cfg = self.cfg
        b, n = seq_idx.shape
        t_emb = jnp.tile(
            timestep_embedding(t, cfg.index_embed_size)[:, None, :], (1, n, 1)
        )
        prot_t = jnp.concatenate([t_emb, fixed_mask[..., None]], axis=-1)  # (b,n,33)
        node_in = jnp.concatenate(
            [prot_t, index_embedding(seq_idx, cfg.index_embed_size)], axis=-1
        )
        # cross-concat of (t_emb, fixed) over pairs: (feat_i, feat_j)
        cross = jnp.concatenate(
            [
                jnp.tile(prot_t[:, :, None, :], (1, 1, n, 1)),
                jnp.tile(prot_t[:, None, :, :], (1, n, 1, 1)),
            ],
            axis=-1,
        ).reshape(b, n * n, -1)
        rel = (seq_idx[:, :, None] - seq_idx[:, None, :]).reshape(b, n * n)
        pair_in = [cross, index_embedding(rel, cfg.index_embed_size)]
        if cfg.embed_self_conditioning:
            dg = calc_distogram(sc_ca_t, cfg.min_bin, cfg.max_bin, cfg.num_bins)
            pair_in.append(dg.reshape(b, n * n, -1))
        node = _MLP3LN(cfg.node_embed_size, name="node_embedder")(node_in)
        edge = _MLP3LN(cfg.edge_embed_size, name="edge_embedder")(
            jnp.concatenate(pair_in, axis=-1)
        )
        return node, edge.reshape(b, n, n, cfg.edge_embed_size)


class InvariantPointAttention(nn.Module):
    """``ipa_pytorch.InvariantPointAttention`` (lines 236-473), einsum form."""

    cfg: FrameDiffConfig
    inf: float = 1e5
    eps: float = 1e-8

    @nn.compact
    def __call__(self, s: Array, z: Array, r7: Array, mask: Array) -> Array:
        cfg = self.cfg
        c_s, c_z, ch = cfg.node_embed_size, cfg.edge_embed_size, cfg.c_hidden
        h, pq, pv = cfg.no_heads, cfg.no_qk_points, cfg.no_v_points
        b, n, _ = s.shape

        q = nn.Dense(h * ch, name="linear_q")(s).reshape(b, n, h, ch)
        kv = nn.Dense(2 * h * ch, name="linear_kv")(s).reshape(b, n, h, 2 * ch)
        k, v = kv[..., :ch], kv[..., ch:]

        def split_stack_points(x, npts):
            # reference layout: output is [all-x, all-y, all-z] thirds
            # (ipa_pytorch.py:348-352 split+stack), -> (b, n, h*npts, 3)
            hp = h * npts
            return jnp.stack([x[..., :hp], x[..., hp : 2 * hp], x[..., 2 * hp :]], axis=-1)

        q_pts = split_stack_points(nn.Dense(h * pq * 3, name="linear_q_points")(s), pq)
        q_pts = rigid.rigid_apply(r7[..., None, :], q_pts).reshape(b, n, h, pq, 3)
        kv_pts = split_stack_points(
            nn.Dense(h * (pq + pv) * 3, name="linear_kv_points")(s), pq + pv
        )
        kv_pts = rigid.rigid_apply(r7[..., None, :], kv_pts).reshape(b, n, h, pq + pv, 3)
        k_pts, v_pts = kv_pts[..., :pq, :], kv_pts[..., pq:, :]

        bias = nn.Dense(h, name="linear_b")(z)  # (b, n, n, h)
        a = jnp.einsum("bihc,bjhc->bhij", q, k) * math.sqrt(1.0 / (3 * ch))
        a = a + math.sqrt(1.0 / 3) * jnp.moveaxis(bias, -1, 1)

        d2 = jnp.sum(
            (q_pts[:, :, None] - k_pts[:, None]) ** 2, axis=-1
        )  # (b, i, j, h, pq)
        head_weights = nn.softplus(
            self.param(
                "head_weights",
                lambda key, shape: jnp.full(shape, 0.541324854612918),
                (h,),
            )
        ) * math.sqrt(1.0 / (3 * (pq * 9.0 / 2)))
        pt_att = jnp.sum(d2 * head_weights[None, None, None, :, None], axis=-1) * (-0.5)
        a = a + jnp.moveaxis(pt_att, -1, 1)  # (b, h, i, j)

        square_mask = self.inf * (mask[:, None, :] * mask[:, :, None] - 1.0)
        a = jax.nn.softmax(a + square_mask[:, None], axis=-1)

        o = jnp.einsum("bhij,bjhc->bihc", a, v).reshape(b, n, h * ch)
        o_pt = jnp.einsum("bhij,bjhpx->bihpx", a, v_pts)  # global frame
        # invert-apply: back to each query's local frame
        rot = rigid.rigid_rotmat(r7)
        trans = rigid.rigid_trans(r7)
        o_pt = jnp.einsum(
            "bnxy,bnhpx->bnhpy", rot, o_pt - trans[:, :, None, None, :]
        )
        o_pt = o_pt.reshape(b, n, h * pv, 3)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt**2, axis=-1) + self.eps)  # (b,n,h*pv)
        pair_z = nn.Dense(c_z // 4, name="down_z")(z)
        o_pair = jnp.einsum("bhij,bijc->bihc", a, pair_z).reshape(b, n, -1)

        # NOTE: the reference declares a vestigial linear_rbf layer that its
        # forward never uses (ipa_pytorch.py:301 TODO); the converter skips
        # those checkpoint keys.
        o_feats = jnp.concatenate(
            [o, o_pt[..., 0], o_pt[..., 1], o_pt[..., 2], o_pt_norm, o_pair], axis=-1
        )
        return nn.Dense(c_s, kernel_init=nn.initializers.zeros, name="linear_out")(
            o_feats
        )


class TorchTransformerLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` (batch_first, post-norm, ReLU,
    dropout 0) as configured at ``ipa_pytorch.py:584-592``."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x: Array, pad_mask: Array) -> Array:
        d, h = self.d_model, self.nhead
        hd = d // h
        b, n, _ = x.shape
        qkv = nn.Dense(3 * d, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, hd)
        k = k.reshape(b, n, h, hd)
        v = v.reshape(b, n, h, hd)
        logits = jnp.einsum("bihc,bjhc->bhij", q, k) / math.sqrt(hd)
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(pad_mask[:, None, None, :] > 0, logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhij,bjhc->bihc", attn, v).reshape(b, n, d)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + nn.Dense(d, name="out_proj")(o))
        ff = nn.Dense(d, name="linear2")(nn.relu(nn.Dense(d, name="linear1")(x)))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class StructureModuleTransition(nn.Module):
    """``ipa_pytorch.StructureModuleTransition`` (lines 169-192)."""

    c: int

    @nn.compact
    def __call__(self, s: Array) -> Array:
        s0 = s
        s = nn.relu(nn.Dense(self.c, name="linear_1")(s))
        s = nn.relu(nn.Dense(self.c, name="linear_2")(s))
        s = nn.Dense(self.c, kernel_init=nn.initializers.zeros, name="linear_3")(s)
        return nn.LayerNorm(epsilon=1e-5, name="ln")(s + s0)


class EdgeTransition(nn.Module):
    """``ipa_pytorch.EdgeTransition`` (lines 194-235)."""

    node_dim: int
    edge_dim: int

    @nn.compact
    def __call__(self, node: Array, edge: Array) -> Array:
        bias_dim = self.node_dim // 2
        ne = nn.Dense(bias_dim, name="initial_embed")(node)
        b, n, _ = ne.shape
        edge_bias = jnp.concatenate(
            [
                jnp.tile(ne[:, :, None, :], (1, 1, n, 1)),
                jnp.tile(ne[:, None, :, :], (1, n, 1, 1)),
            ],
            axis=-1,
        )
        e = jnp.concatenate([edge, edge_bias], axis=-1)
        hidden = e.shape[-1]
        t = nn.relu(nn.Dense(hidden, name="trunk_0")(e))
        t = nn.relu(nn.Dense(hidden, name="trunk_1")(t))
        e = nn.Dense(self.edge_dim, kernel_init=nn.initializers.zeros,
                     name="final_layer")(t + e)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(e)


class TorsionAngles(nn.Module):
    """``ipa_pytorch.TorsionAngles`` — note linear_3 exists in checkpoints but
    is NOT used in forward (reference TODO at line 485)."""

    c: int
    num_torsions: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, s: Array):
        s0 = s
        s = nn.relu(nn.Dense(self.c, name="linear_1")(s))
        s = nn.Dense(self.c, name="linear_2")(s)
        # (checkpoint linear_3 is vestigial — not used in the reference
        # forward either, ipa_pytorch.py:485 TODO)
        s = s + s0
        raw = nn.Dense(self.num_torsions * 2, kernel_init=nn.initializers.zeros,
                       name="linear_final")(s)
        denom = jnp.sqrt(
            jnp.clip(jnp.sum(raw**2, axis=-1, keepdims=True), min=self.eps)
        )
        return raw, raw / denom


class FrameDiffScoreNetwork(nn.Module):
    """``ScoreNetwork`` + ``IpaScore``: the full checkpoint-faithful model.

    ``score_calc`` supplies ``calc_rot_score(rot0, rot1, t)`` and
    ``calc_trans_score(x0, x1, t)`` (an ``SE3Diffuser``); pass None to skip
    score conversion and return raw rigids/psi only.
    """

    cfg: FrameDiffConfig
    score_calc: Optional[object] = None

    @nn.compact
    def __call__(self, feats: dict) -> dict:
        cfg = self.cfg
        bb_mask = feats["res_mask"].astype(jnp.float32)
        fixed_mask = feats["fixed_mask"].astype(jnp.float32)
        edge_mask = bb_mask[:, :, None] * bb_mask[:, None, :]
        diffuse_mask = (1.0 - fixed_mask) * bb_mask

        node, edge = Embedder(cfg, name="embedder")(
            feats["seq_idx"], feats["t"], fixed_mask, feats["sc_ca_t"]
        )
        edge = edge * edge_mask[..., None]
        init_node = node * bb_mask[..., None]
        node = init_node * bb_mask[..., None]

        init_rigids = feats["rigids_t"].astype(jnp.float32)
        scale = cfg.coordinate_scaling
        curr = init_rigids.at[..., 4:].multiply(scale)

        for b in range(cfg.num_blocks):
            ipa_out = InvariantPointAttention(cfg, name=f"ipa_{b}")(
                node, edge, curr, bb_mask
            )
            node = nn.LayerNorm(epsilon=1e-5, name=f"ipa_ln_{b}")(node + ipa_out * bb_mask[..., None])
            skip = nn.Dense(
                cfg.c_skip, kernel_init=nn.initializers.zeros, name=f"skip_embed_{b}"
            )(init_node)
            tin = jnp.concatenate([node, skip], axis=-1)
            for l in range(cfg.seq_tfmr_num_layers):
                tin = TorchTransformerLayer(
                    cfg.node_embed_size + cfg.c_skip, cfg.seq_tfmr_num_heads,
                    name=f"seq_tfmr_{b}_layer_{l}",
                )(tin, bb_mask)
            node = node + nn.Dense(
                cfg.node_embed_size, kernel_init=nn.initializers.zeros,
                name=f"post_tfmr_{b}",
            )(tin)
            node = StructureModuleTransition(
                cfg.node_embed_size, name=f"node_transition_{b}"
            )(node)
            node = node * bb_mask[..., None]
            update = nn.Dense(
                6, kernel_init=nn.initializers.zeros, name=f"bb_update_{b}"
            )(node * diffuse_mask[..., None])
            curr = rigid.rigid_compose_q_update(curr, update, diffuse_mask[..., None])
            if b < cfg.num_blocks - 1:
                edge = EdgeTransition(
                    cfg.node_embed_size, cfg.edge_embed_size,
                    name=f"edge_transition_{b}",
                )(node, edge)
                edge = edge * edge_mask[..., None]

        _, psi = TorsionAngles(cfg.node_embed_size, name="torsion_pred")(node)
        # fixed residues keep their ground-truth psi (score_network.py:202-204)
        if "torsion_angles_sin_cos" in feats:
            gt_psi = feats["torsion_angles_sin_cos"][..., 2, :]
            psi = (1.0 - fixed_mask[..., None]) * psi + fixed_mask[..., None] * gt_psi

        pred_rigids = curr.at[..., 4:].multiply(1.0 / scale)
        out = {
            "rigids": pred_rigids,
            "psi": psi,
            "pred_trans": rigid.rigid_trans(pred_rigids),
            "pred_rotmats": rigid.rigid_rotmat(pred_rigids),
        }
        if self.score_calc is not None:
            t = feats["t"]
            rot_score = self.score_calc.calc_rot_score(
                rigid.rigid_rotmat(init_rigids), rigid.rigid_rotmat(pred_rigids),
                t[:, None],
            )
            trans_score = self.score_calc.calc_trans_score(
                rigid.rigid_trans(init_rigids), rigid.rigid_trans(pred_rigids),
                t[:, None, None],
            )
            out["rot_score"] = rot_score * bb_mask[..., None]
            out["trans_score"] = trans_score * bb_mask[..., None]
        return out
