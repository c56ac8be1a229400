"""Torch checkpoint -> Flax parameter conversion for the protein models.

The reference distributes FrameDiff/Proteus weights as torch pickles of the
form ``{'conf': OmegaConf, 'model': state_dict, ...}`` and loads them with
``module.``-prefix stripping (FrameDiff:
``se3diff_experiments/inference_se3_diffusion.py:130-159``; Proteus:
``proteus_model/fold_module.py:78-110``). This module converts those
state_dicts onto the weight-compatible Flax networks in ``framediff.py``.

OmegaConf is not installed in this environment, so the pickle loader
rehydrates ``omegaconf.*`` objects through stub classes and walks their
pickled ``_content`` into plain dicts — enough to recover the
checkpoint-embedded model config that the reference merges over the file
config (``inference_se3_diffusion.py:140-141``).

The exact state_dict key schema (282 tensors) recorded from the reference
implementation lives in ``tests/fixtures/framediff_state_dict_schema.json``;
``tests/test_framediff_parity.py`` checks the mapping covers it exactly.
"""

from __future__ import annotations

import io
import pickle
import warnings
from typing import Dict, Optional, Tuple

import numpy as np

from .framediff import FrameDiffConfig


# ---------------------------------------------------------------------------
# Torch-pickle loading without omegaconf installed
# ---------------------------------------------------------------------------


class _ConfStub:
    """Accepts any pickled omegaconf object state; exposes it as attrs."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (dict-state, slots-state)
            state = {k: v for part in state if isinstance(part, dict)
                     for k, v in part.items()}
        self.__dict__.update(state if isinstance(state, dict) else {})


def _stub_find_class(module: str, name: str, default):
    if module.startswith("omegaconf"):
        return type(name, (_ConfStub,), {})
    return default(module, name)


def conf_to_dict(obj):
    """Walk a stub-rehydrated OmegaConf tree into plain python values."""
    if isinstance(obj, _ConfStub):
        d = obj.__dict__
        if "_content" in d:
            return conf_to_dict(d["_content"])
        if "_val" in d:  # ValueNode
            return conf_to_dict(d["_val"])
        return {k: conf_to_dict(v) for k, v in d.items() if not k.startswith("_")}
    if isinstance(obj, dict):
        return {k: conf_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [conf_to_dict(v) for v in obj]
    return obj


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Optional[dict]]:
    """Load a reference protein checkpoint pickle.

    Returns (state_dict as numpy arrays with 'module.' stripped, conf dict or
    None). Uses torch's deserialization for the tensor payloads but stubs the
    omegaconf classes embedded in the pickle.
    """
    import torch

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            return _stub_find_class(module, name, super().find_class)

    class _PickleModule:
        Unpickler = _Unpickler
        load = staticmethod(lambda f, **kw: _Unpickler(f, **kw).load())
        loads = staticmethod(
            lambda b, **kw: _Unpickler(io.BytesIO(b), **kw).load()
        )

    payload = torch.load(
        path, map_location="cpu", pickle_module=_PickleModule, weights_only=False
    )
    if isinstance(payload, dict) and "model" in payload:
        raw_sd = payload["model"]
        conf = None
        try:
            conf = conf_to_dict(payload.get("conf"))
        except Exception as e:  # conf is best-effort; weights are the payload
            warnings.warn(f"could not decode checkpoint conf: {e}", stacklevel=2)
    else:
        raw_sd, conf = payload, None
    # DDP checkpoints carry a 'module.' prefix (inference_se3_diffusion.py:155)
    sd = {
        k.replace("module.", "", 1) if k.startswith("module.") else k:
            np.asarray(v.detach().numpy() if hasattr(v, "detach") else v,
                       dtype=np.float32)
        for k, v in raw_sd.items()
    }
    return sd, conf


# ---------------------------------------------------------------------------
# FrameDiff mapping
# ---------------------------------------------------------------------------

_T = "T"  # transpose linear weight (out,in) -> kernel (in,out)
_ID = None  # copy verbatim


def _linear(torch_mod: str, flax_path: str):
    return [
        (f"{torch_mod}.weight", f"{flax_path}/kernel", _T),
        (f"{torch_mod}.bias", f"{flax_path}/bias", _ID),
    ]


def _ln(torch_mod: str, flax_path: str):
    return [
        (f"{torch_mod}.weight", f"{flax_path}/scale", _ID),
        (f"{torch_mod}.bias", f"{flax_path}/bias", _ID),
    ]


def framediff_mapping(cfg: FrameDiffConfig):
    """(torch key, flax path, transform) triplets for every *used* tensor.

    The vestigial ``linear_rbf`` / ``torsion_pred.linear_3`` checkpoint keys
    (reference TODOs, unused in its forward) have no Flax counterpart and are
    listed by :func:`framediff_unused_keys` instead.
    """
    m = []
    for emb in ("node_embedder", "edge_embedder"):
        for i, li in ((0, 0), (2, 1), (4, 2)):
            m += _linear(f"embedding_layer.{emb}.{i}", f"embedder/{emb}/linear_{li}")
        m += _ln(f"embedding_layer.{emb}.5", f"embedder/{emb}/ln")
    tr = "score_model.trunk"
    for b in range(cfg.num_blocks):
        ipa_t, ipa_f = f"{tr}.ipa_{b}", f"ipa_{b}"
        for lin in ("linear_q", "linear_kv", "linear_q_points", "linear_kv_points",
                    "linear_b", "down_z", "linear_out"):
            m += _linear(f"{ipa_t}.{lin}", f"{ipa_f}/{lin}")
        m += [(f"{ipa_t}.head_weights", f"{ipa_f}/head_weights", _ID)]
        m += _ln(f"{tr}.ipa_ln_{b}", f"ipa_ln_{b}")
        m += _linear(f"{tr}.skip_embed_{b}", f"skip_embed_{b}")
        for l in range(cfg.seq_tfmr_num_layers):
            tl = f"{tr}.seq_tfmr_{b}.layers.{l}"
            fl = f"seq_tfmr_{b}_layer_{l}"
            m += [
                (f"{tl}.self_attn.in_proj_weight", f"{fl}/in_proj/kernel", _T),
                (f"{tl}.self_attn.in_proj_bias", f"{fl}/in_proj/bias", _ID),
            ]
            m += _linear(f"{tl}.self_attn.out_proj", f"{fl}/out_proj")
            m += _linear(f"{tl}.linear1", f"{fl}/linear1")
            m += _linear(f"{tl}.linear2", f"{fl}/linear2")
            m += _ln(f"{tl}.norm1", f"{fl}/norm1")
            m += _ln(f"{tl}.norm2", f"{fl}/norm2")
        m += _linear(f"{tr}.post_tfmr_{b}", f"post_tfmr_{b}")
        nt = f"{tr}.node_transition_{b}"
        for lin in ("linear_1", "linear_2", "linear_3"):
            m += _linear(f"{nt}.{lin}", f"node_transition_{b}/{lin}")
        m += _ln(f"{nt}.ln", f"node_transition_{b}/ln")
        m += _linear(f"{tr}.bb_update_{b}.linear", f"bb_update_{b}")
        if b < cfg.num_blocks - 1:
            et = f"{tr}.edge_transition_{b}"
            m += _linear(f"{et}.initial_embed", f"edge_transition_{b}/initial_embed")
            m += _linear(f"{et}.trunk.0", f"edge_transition_{b}/trunk_0")
            m += _linear(f"{et}.trunk.2", f"edge_transition_{b}/trunk_1")
            m += _linear(f"{et}.final_layer", f"edge_transition_{b}/final_layer")
            m += _ln(f"{et}.layer_norm", f"edge_transition_{b}/layer_norm")
    tp = "score_model.torsion_pred"
    for lin in ("linear_1", "linear_2", "linear_final"):
        m += _linear(f"{tp}.{lin}", f"torsion_pred/{lin}")
    return m


def framediff_unused_keys(cfg: FrameDiffConfig):
    """Checkpoint keys the reference forward itself never uses."""
    keys = []
    for b in range(cfg.num_blocks):
        keys += [
            f"score_model.trunk.ipa_{b}.linear_rbf.weight",
            f"score_model.trunk.ipa_{b}.linear_rbf.bias",
        ]
    keys += [
        "score_model.torsion_pred.linear_3.weight",
        "score_model.torsion_pred.linear_3.bias",
    ]
    return keys


def _set(params: dict, path: str, value: np.ndarray):
    node = params
    keys = path.split("/")
    for k in keys[:-1]:
        node = node[k]
    old = node[keys[-1]]
    assert old.shape == value.shape, f"{path}: {old.shape} vs {value.shape}"
    node[keys[-1]] = value.astype(np.float32)


def apply_framediff_state_dict(params: dict, sd: Dict[str, np.ndarray],
                               cfg: FrameDiffConfig) -> Tuple[dict, int]:
    """Write a reference state_dict into a (mutable nested-dict) Flax tree.

    Returns (params, n_applied). Raises on missing expected keys or shape
    mismatches — a silent partial load would be worse than a loud failure.
    """
    import flax

    params = flax.core.unfreeze(params)
    mapping = framediff_mapping(cfg)
    applied = 0
    missing = []
    for tk, fp, tf in mapping:
        if tk not in sd:
            missing.append(tk)
            continue
        val = sd[tk]
        _set(params, fp, val.T if tf == _T else val)
        applied += 1
    if missing:
        raise KeyError(
            f"checkpoint is missing {len(missing)} expected tensors, e.g. "
            f"{missing[:5]}"
        )
    leftover = set(sd) - {tk for tk, _, _ in mapping} - set(framediff_unused_keys(cfg))
    if leftover:
        warnings.warn(
            f"{len(leftover)} unconverted checkpoint tensors: "
            f"{sorted(leftover)[:8]}", stacklevel=2,
        )
    return params, applied


def load_framediff_checkpoint(path: str, params: dict):
    """One-call loader: torch pkl -> (config, converted flax params).

    ``params`` is a freshly-initialized FrameDiffScoreNetwork tree whose
    config must match the checkpoint's embedded conf (build it via
    ``FrameDiffConfig.from_ckpt_conf`` after peeking with
    :func:`load_torch_checkpoint` when unsure).
    """
    sd, conf = load_torch_checkpoint(path)
    cfg = (
        FrameDiffConfig.from_ckpt_conf(conf["model"])
        if conf and "model" in conf
        else FrameDiffConfig()
    )
    params, n = apply_framediff_state_dict(params, sd, cfg)
    return cfg, params, n


# ---------------------------------------------------------------------------
# Proteus mapping
# ---------------------------------------------------------------------------


def _attn(torch_mod: str, flax_path: str, gating: bool = True):
    m = []
    for lin in ("linear_q", "linear_k", "linear_v"):  # bias-free
        m += [(f"{torch_mod}.{lin}.weight", f"{flax_path}/{lin}/kernel", _T)]
    if gating:
        m += _linear(f"{torch_mod}.linear_g", f"{flax_path}/linear_g")
    m += _linear(f"{torch_mod}.linear_o", f"{flax_path}/linear_o")
    return m


def _tri_mul(torch_mod: str, flax_path: str):
    m = []
    for lin in ("linear_a_p", "linear_a_g", "linear_b_p", "linear_b_g",
                "linear_g", "linear_z"):
        m += _linear(f"{torch_mod}.{lin}", f"{flax_path}/{lin}")
    m += _ln(f"{torch_mod}.layer_norm_in", f"{flax_path}/layer_norm_in")
    m += _ln(f"{torch_mod}.layer_norm_out", f"{flax_path}/layer_norm_out")
    return m


def _pair_transition(torch_mod: str, flax_path: str):
    m = _ln(f"{torch_mod}.layer_norm", f"{flax_path}/layer_norm")
    m += _linear(f"{torch_mod}.linear_1", f"{flax_path}/linear_1")
    m += _linear(f"{torch_mod}.linear_2", f"{flax_path}/linear_2")
    return m


def proteus_mapping(cfg):
    """(torch key, flax path, transform) for the Proteus ScoreNetwork.

    cfg: a ProteusConfig (``models/protein/proteus.py``)."""
    m = []
    emb = "embedding_layer"
    for e in ("node_embedder", "edge_embedder"):
        for i, li in ((0, 0), (2, 1), (4, 2)):
            m += _linear(f"{emb}.{e}.{i}", f"{emb}/{e}/linear_{li}")
        m += _ln(f"{emb}.{e}.5", f"{emb}/{e}/ln")
    for e in ("ss_embedder", "adjacency_embedder", "hotspot_embedder"):
        m += _linear(f"{emb}.{e}", f"{emb}/{e}")
    te_t, te_f = f"{emb}.template_embedder", f"{emb}/template_embedder"
    m += _linear(f"{te_t}.self_condition_s", f"{te_f}/self_condition_s")
    m += _linear(f"{te_t}.self_condition_z", f"{te_f}/self_condition_z")
    m += _linear(f"{te_t}.template_angle_embedder.linear_1",
                 f"{te_f}/template_angle_embedder/linear_1")
    m += _linear(f"{te_t}.template_angle_embedder.linear_2",
                 f"{te_f}/template_angle_embedder/linear_2")
    m += _linear(f"{te_t}.template_pair_embedder.linear",
                 f"{te_f}/template_pair_embedder/linear")
    ps_t, ps_f = f"{te_t}.template_pair_stack", f"{te_f}/template_pair_stack"
    m += _tri_mul(f"{ps_t}.tri_mul_out", f"{ps_f}/tri_mul_out")
    m += _tri_mul(f"{ps_t}.tri_mul_in", f"{ps_f}/tri_mul_in")
    m += _pair_transition(f"{ps_t}.pair_transition", f"{ps_f}/pair_transition")
    m += _ln(f"{ps_t}.layer_norm", f"{ps_f}/layer_norm")
    ce_t = f"{te_t}.template_cross_embedder"
    ce_f = f"{te_f}/template_cross_embedder"
    m += _attn(f"{ce_t}.template_pointwise_att.mha",
               f"{ce_f}/template_pointwise_att/mha", gating=False)
    m += _attn(f"{ce_t}.template_columnwise_attention.mha",
               f"{ce_f}/template_columnwise_attention/mha", gating=True)
    if getattr(cfg, "struct2seq_enable", False):
        # struct2seq cross embedder (score_network.py:99, same
        # TemplateCrossEmbedder class; the MPNN_ESM combiner heads under
        # embedding_layer.struct2seq_embedder.* belong to the separate
        # MPNNESM tree — see extract_struct2seq_heads)
        se_t = f"{emb}.struct2seq_cross_embedder"
        se_f = f"{emb}/struct2seq_cross_embedder"
        m += _attn(f"{se_t}.template_pointwise_att.mha",
                   f"{se_f}/template_pointwise_att/mha", gating=False)
        m += _attn(f"{se_t}.template_columnwise_attention.mha",
                   f"{se_f}/template_columnwise_attention/mha", gating=True)

    tr = "score_model.trunk"
    for b in range(cfg.num_blocks):
        ipa_t, ipa_f = f"{tr}.ipa_{b}", f"ipa_{b}"
        for lin in ("linear_q", "linear_kv", "linear_q_points",
                    "linear_kv_points", "linear_b", "down_z", "linear_out"):
            m += _linear(f"{ipa_t}.{lin}", f"{ipa_f}/{lin}")
        m += [(f"{ipa_t}.head_weights", f"{ipa_f}/head_weights", _ID)]
        m += _ln(f"{tr}.ipa_ln_{b}", f"ipa_ln_{b}")
        m += _linear(f"{tr}.skip_embed_{b}", f"skip_embed_{b}")
        for l in range(cfg.seq_tfmr_num_layers):
            tl, fl = f"{tr}.seq_tfmr_{b}.layers.{l}", f"seq_tfmr_{b}_layer_{l}"
            m += [
                (f"{tl}.self_attn.in_proj_weight", f"{fl}/in_proj/kernel", _T),
                (f"{tl}.self_attn.in_proj_bias", f"{fl}/in_proj/bias", _ID),
            ]
            m += _linear(f"{tl}.self_attn.out_proj", f"{fl}/out_proj")
            m += _linear(f"{tl}.linear1", f"{fl}/linear1")
            m += _linear(f"{tl}.linear2", f"{fl}/linear2")
            m += _ln(f"{tl}.norm1", f"{fl}/norm1")
            m += _ln(f"{tl}.norm2", f"{fl}/norm2")
        m += _linear(f"{tr}.post_tfmr_{b}", f"post_tfmr_{b}")
        for lin in ("linear_1", "linear_2", "linear_3"):
            m += _linear(f"{tr}.node_transition_{b}.{lin}",
                         f"node_transition_{b}/{lin}")
        m += _ln(f"{tr}.node_transition_{b}.ln", f"node_transition_{b}/ln")
        m += _linear(f"{tr}.bb_update_{b}.linear", f"bb_update_{b}")
        if b < cfg.num_blocks - 1:
            et, ef = f"{tr}.edge_transition_{b}", f"edge_transition_{b}"
            for lin in ("proj_left", "proj_right", "to_gate", "emb_rbf"):
                m += _linear(f"{et}.{lin}", f"{ef}/{lin}")
            m += [(f"{et}.to_bias.weight", f"{ef}/to_bias/kernel", _T)]
            m += _tri_mul(f"{et}.tri_mul_out", f"{ef}/tri_mul_out")
            m += _tri_mul(f"{et}.tri_mul_in", f"{ef}/tri_mul_in")
            m += _attn(f"{et}.mha_start", f"{ef}/mha_start")
            m += _attn(f"{et}.mha_end", f"{ef}/mha_end")
            m += _ln(f"{et}.layer_norm", f"{ef}/layer_norm")
    for lin in ("linear_1", "linear_2", "linear_final"):
        m += _linear(f"score_model.torsion_pred.{lin}", f"torsion_pred/{lin}")
    for head in ("dist_head", "omega_head", "theta_head", "phi_head"):
        m += _linear(f"auxiliary_heads.{head}.linear", f"{head}/linear")
    return m


def proteus_unused_keys(cfg):
    """Checkpoint tensors the reference inference forward never uses."""
    keys = ["score_model.torsion_pred.linear_3.weight",
            "score_model.torsion_pred.linear_3.bias"]
    for b in range(cfg.num_blocks):
        keys += [
            f"score_model.trunk.ipa_{b}.linear_rbf.weight",
            f"score_model.trunk.ipa_{b}.linear_rbf.bias",
        ]
        if b < cfg.num_blocks - 1:
            # LocalTriangleAttentionNew declares pair_transition but never
            # calls it (ipa_pytorch.py:284-287 vs 391-417)
            pt = f"score_model.trunk.edge_transition_{b}.pair_transition"
            keys += [
                f"{pt}.layer_norm.weight", f"{pt}.layer_norm.bias",
                f"{pt}.linear_1.weight", f"{pt}.linear_1.bias",
                f"{pt}.linear_2.weight", f"{pt}.linear_2.bias",
            ]
    return keys


def apply_proteus_state_dict(params: dict, sd: Dict[str, np.ndarray], cfg):
    """Write a reference Proteus state_dict into a Flax tree; loud failure."""
    import flax

    params = flax.core.unfreeze(params)
    mapping = proteus_mapping(cfg)
    applied, missing = 0, []
    for tk, fp, tf in mapping:
        if tk not in sd:
            missing.append(tk)
            continue
        _set(params, fp, sd[tk].T if tf == _T else sd[tk])
        applied += 1
    if missing:
        raise KeyError(
            f"checkpoint is missing {len(missing)} expected tensors, e.g. "
            f"{missing[:5]}"
        )
    leftover = set(sd) - {tk for tk, _, _ in mapping} - set(proteus_unused_keys(cfg))
    # MPNN_ESM combiner heads live in the separate MPNNESM tree
    # (extract_struct2seq_heads / apply_mpnn_esm_heads), not this one
    leftover = {k for k in leftover if not k.startswith(STRUCT2SEQ_PREFIX)}
    if leftover:
        warnings.warn(
            f"{len(leftover)} unconverted checkpoint tensors: "
            f"{sorted(leftover)[:8]}", stacklevel=2,
        )
    return params, applied


# ---------------------------------------------------------------------------
# struct2seq (MPNN_ESM) mappings — strcture2seq.py:10-133
# ---------------------------------------------------------------------------


def _apply_state_dict(params: dict, sd: Dict[str, np.ndarray], mapping,
                      unused_keys, what: str) -> Tuple[dict, int]:
    """Shared strict applier: raise on missing mapped tensors, warn on
    leftovers not in the recorded vestigial set (same contract as
    apply_framediff_state_dict)."""
    import flax

    params = flax.core.unfreeze(params)
    applied, missing = 0, []
    for tk, fp, tf in mapping:
        if tk not in sd:
            missing.append(tk)
            continue
        _set(params, fp, sd[tk].T if tf == _T else sd[tk])
        applied += 1
    if missing:
        raise KeyError(
            f"{what} checkpoint is missing {len(missing)} expected tensors, "
            f"e.g. {missing[:5]}"
        )
    leftover = set(sd) - {tk for tk, _, _ in mapping} - set(unused_keys)
    if leftover:
        warnings.warn(
            f"{what}: {len(leftover)} unconverted checkpoint tensors: "
            f"{sorted(leftover)[:8]}", stacklevel=2,
        )
    return params, applied


def mpnn_mapping(cfg):
    """CA-only ProteinMPNN (protein_mpnn_utils.py:1080-1110) state_dict ->
    Flax ProteinMPNNCA paths. cfg: struct2seq.MPNNConfig."""
    m = []
    m += _linear("features.embeddings.linear", "features/embeddings/linear")
    m += [("features.edge_embedding.weight",
           "features/edge_embedding/kernel", _T)]
    m += _ln("features.norm_edges", "features/norm_edges")
    m += _linear("W_e", "W_e")
    m += [("W_s.weight", "W_s/embedding", _ID)]
    for i in range(cfg.num_encoder_layers):
        t, f = f"encoder_layers.{i}", f"encoder_layers_{i}"
        for lin in ("W1", "W2", "W3", "W11", "W12", "W13"):
            m += _linear(f"{t}.{lin}", f"{f}/{lin}")
        for n_ in ("norm1", "norm2", "norm3"):
            m += _ln(f"{t}.{n_}", f"{f}/{n_}")
        m += _linear(f"{t}.dense.W_in", f"{f}/dense/W_in")
        m += _linear(f"{t}.dense.W_out", f"{f}/dense/W_out")
    for i in range(cfg.num_decoder_layers):
        t, f = f"decoder_layers.{i}", f"decoder_layers_{i}"
        for lin in ("W1", "W2", "W3"):
            m += _linear(f"{t}.{lin}", f"{f}/{lin}")
        for n_ in ("norm1", "norm2"):
            m += _ln(f"{t}.{n_}", f"{f}/{n_}")
        m += _linear(f"{t}.dense.W_in", f"{f}/dense/W_in")
        m += _linear(f"{t}.dense.W_out", f"{f}/dense/W_out")
    m += _linear("W_out", "W_out")
    return m


def mpnn_unused_keys(cfg):
    """Declared-but-unused in the reference CA forward: W_v is never applied
    (h_V starts from zeros, protein_mpnn_utils.py:1121-1123) and
    CA_ProteinFeatures' node_embedding/norm_nodes are marked NOT USED
    (protein_mpnn_utils.py:810-813)."""
    return [
        "W_v.weight", "W_v.bias",
        "features.node_embedding.weight",
        "features.norm_nodes.weight", "features.norm_nodes.bias",
    ]


def apply_mpnn_state_dict(params: dict, sd: Dict[str, np.ndarray], cfg):
    return _apply_state_dict(params, sd, mpnn_mapping(cfg),
                             mpnn_unused_keys(cfg), "ProteinMPNN")


def load_mpnn_checkpoint(path: str):
    """Load a ProteinMPNN CA weights file (e.g. v_48_020.pt).

    The file is a torch pickle {'num_edges': k, 'model_state_dict': ...}
    (strcture2seq.py:16-18 reads both). Returns (state_dict as numpy,
    k_neighbors)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in ckpt["model_state_dict"].items()}
    return sd, int(ckpt.get("num_edges", 48))


def esm2_mapping(cfg):
    """transformers ``EsmModel`` state_dict -> Flax ESM2 paths. The official
    HF ESM2 checkpoints (facebook/esm2_t33_650M_UR50D = the reference's
    esm_name, strcture2seq.py:11) use this schema. cfg: struct2seq.ESM2Config."""
    m = [("embeddings.word_embeddings.weight", "embed_tokens/embedding", _ID)]
    for i in range(cfg.num_layers):
        t, f = f"encoder.layer.{i}", f"layer_{i}"
        m += _linear(f"{t}.attention.self.query", f"{f}/q")
        m += _linear(f"{t}.attention.self.key", f"{f}/k")
        m += _linear(f"{t}.attention.self.value", f"{f}/v")
        m += _linear(f"{t}.attention.output.dense", f"{f}/out")
        m += _ln(f"{t}.attention.LayerNorm", f"{f}/attn_ln")
        m += _linear(f"{t}.intermediate.dense", f"{f}/fc1")
        m += _linear(f"{t}.output.dense", f"{f}/fc2")
        m += _ln(f"{t}.LayerNorm", f"{f}/ffn_ln")
    m += _ln("encoder.emb_layer_norm_after", "emb_layer_norm_after")
    return m


def esm2_unused_keys(cfg):
    # contact head: attention-map regression unused by MPNN_ESM (it
    # consumes the raw attentions, strcture2seq.py:74-82)
    keys = ["embeddings.position_ids",
            "contact_head.regression.weight", "contact_head.regression.bias"]
    for i in range(cfg.num_layers):
        keys.append(
            f"encoder.layer.{i}.attention.self.rotary_embeddings.inv_freq"
        )
    return keys


def apply_esm2_state_dict(params: dict, sd: Dict[str, np.ndarray], cfg):
    return _apply_state_dict(params, sd, esm2_mapping(cfg),
                             esm2_unused_keys(cfg), "ESM2")


def load_esm2_snapshot(path: str):
    """Load a local transformers ``EsmModel`` snapshot directory (e.g. a
    facebook/esm2_t33_650M_UR50D download — the reference's esm_name,
    strcture2seq.py:11) into (numpy state_dict, struct2seq.ESM2Config).

    Weights are gated: local files only, no network egress attempted."""
    from transformers.models.esm import EsmModel

    from .struct2seq import ESM2Config

    hf = EsmModel.from_pretrained(path, local_files_only=True,
                                  add_pooling_layer=False)
    c = hf.config
    cfg = ESM2Config(
        vocab_size=int(c.vocab_size), embed_dim=int(c.hidden_size),
        num_layers=int(c.num_hidden_layers),
        attention_heads=int(c.num_attention_heads),
        intermediate_dim=int(c.intermediate_size),
        token_dropout=bool(c.token_dropout),
        layer_norm_eps=float(c.layer_norm_eps),
    )
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in hf.state_dict().items()}
    return sd, cfg


STRUCT2SEQ_PREFIX = "embedding_layer.struct2seq_embedder."


def mpnn_esm_heads_mapping():
    """The four trained combiner heads MPNN_ESM contributes to a Proteus
    checkpoint (its state_dict override strips the frozen MPNN/ESM tensors,
    strcture2seq.py:34-37). Keys are relative to STRUCT2SEQ_PREFIX."""
    return [
        ("esm_s_combine", "esm_s_combine", _ID),
        ("esm_p_combine", "esm_p_combine", _ID),
        ("esm_s_mlp.0.weight", "esm_s_mlp_ln/scale", _ID),
        ("esm_s_mlp.0.bias", "esm_s_mlp_ln/bias", _ID),
        *_linear("esm_s_mlp.1", "esm_s_mlp_0"),
        *_linear("esm_s_mlp.3", "esm_s_mlp_1"),
        *_linear("esm_p_mlp", "esm_p_mlp"),
    ]


def extract_struct2seq_heads(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pull the MPNN_ESM combiner-head tensors out of a full Proteus
    state_dict (keys under ``embedding_layer.struct2seq_embedder.``)."""
    return {k[len(STRUCT2SEQ_PREFIX):]: v for k, v in sd.items()
            if k.startswith(STRUCT2SEQ_PREFIX)}


def apply_mpnn_esm_heads(params: dict, heads_sd: Dict[str, np.ndarray]):
    """Write the combiner heads into an MPNNESM Flax tree (the frozen
    MPNN/ESM subtrees are loaded separately via apply_mpnn_state_dict /
    apply_esm2_state_dict)."""
    return _apply_state_dict(params, heads_sd, mpnn_esm_heads_mapping(),
                             [], "MPNN_ESM heads")
