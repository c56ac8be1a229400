"""struct2seq (MPNN_ESM) validation.

Three layers, same strategy as the other protein parity tests:

1. converter mappings must cover the reference torch models' state_dicts
   exactly (CA-ProteinMPNN schema taken live from the reference class;
   ESM2 schema taken live from transformers' EsmModel — the HF ESM2
   checkpoints share fair-esm's weights);
2. numerical parity of the converted Flax models against the executing
   torch references (teacher-forced MPNN forward; full ESM2 tower incl.
   rotary attention, token dropout, per-layer representations/attentions);
3. the conditioned Proteus forward: with an injected MPNN_ESM the
   struct2seq gate must actually change the node/edge streams (the round-2
   warning path at proteus.py 'struct2seq enabled but no weights' becomes
   unreachable).

Reference: applications/proteins/Proteus/proteus_model/strcture2seq.py:1-133,
ProteinMPNN/protein_mpnn_utils.py:636-1258.
"""

import os
import sys
import types
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models.protein import convert as pconvert
from superdiff_tpu.models.protein import struct2seq as s2s

REFERENCE = "/root/reference/applications/proteins/Proteus"


def _stub_modules():
    class _Stub(types.ModuleType):
        __path__ = []

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            full = self.__name__ + "." + name
            sub = _Stub(full)
            sys.modules.setdefault(full, sub)
            return sub

    for m in ("Bio", "Bio.PDB", "Bio.PDB.Chain", "torch_scatter", "esm",
              "omegaconf", "pyrosetta", "mdtraj"):
        sys.modules.setdefault(m, _Stub(m))


def _load_reference_mpnn_utils():
    _stub_modules()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from ProteinMPNN import protein_mpnn_utils  # noqa: E402

    return protein_mpnn_utils


def _chain_ca(b, n, seed):
    """CA trace with realistic ~3.8A steps (some outside the (3.6, 4.0)
    virtual-bond window so the dX_mask branch is exercised)."""
    rng = np.random.RandomState(seed)
    steps = rng.randn(b, n, 3).astype(np.float32)
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    lengths = rng.uniform(3.4, 4.1, (b, n, 1)).astype(np.float32)
    return np.cumsum(steps * lengths, axis=1)


def _torch_mpnn(mpnn_utils, cfg, seed=0):
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    model = mpnn_utils.ProteinMPNN(
        ca_only=True, num_letters=cfg.num_letters,
        node_features=cfg.node_features, edge_features=cfg.edge_features,
        hidden_dim=cfg.hidden_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        augment_eps=0.0, k_neighbors=cfg.k_neighbors,
    )
    model.eval()
    return model


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_mpnn_mapping_covers_reference_schema():
    mpnn_utils = _load_reference_mpnn_utils()
    cfg = s2s.MPNNConfig()
    sd = _torch_mpnn(mpnn_utils, cfg).state_dict()
    mapped = {tk for tk, _, _ in pconvert.mpnn_mapping(cfg)}
    unused = set(pconvert.mpnn_unused_keys(cfg))
    assert mapped.isdisjoint(unused)
    assert mapped | unused == set(sd), (
        f"missing={sorted(set(sd) - mapped - unused)[:6]} "
        f"extra={sorted(mapped - set(sd))[:6]}"
    )


def test_esm2_mapping_covers_transformers_schema():
    from transformers.models.esm import EsmConfig, EsmModel

    cfg = s2s.ESM2Config.tiny()
    hf = EsmModel(
        EsmConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.embed_dim,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.attention_heads,
            intermediate_size=cfg.intermediate_dim,
            position_embedding_type="rotary", emb_layer_norm_before=False,
            token_dropout=True, pad_token_id=s2s.ESM_PAD,
            mask_token_id=s2s.ESM_MASK, layer_norm_eps=cfg.layer_norm_eps,
        ),
        add_pooling_layer=False,
    )
    sd = hf.state_dict()
    mapped = {tk for tk, _, _ in pconvert.esm2_mapping(cfg)}
    unused = set(pconvert.esm2_unused_keys(cfg))
    assert mapped | unused >= set(sd), sorted(set(sd) - mapped - unused)[:8]
    assert mapped <= set(sd), sorted(mapped - set(sd))[:8]


@pytest.mark.torch_parity
@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_mpnn_teacher_forced_parity_vs_reference_torch():
    import torch

    mpnn_utils = _load_reference_mpnn_utils()
    cfg = s2s.MPNNConfig(
        node_features=32, edge_features=32, hidden_dim=32,
        num_encoder_layers=2, num_decoder_layers=2, k_neighbors=12,
    )
    tmodel = _torch_mpnn(mpnn_utils, cfg, seed=1)

    b, n = 2, 25
    ca = _chain_ca(b, n, seed=7)
    mask = np.ones((b, n), np.float32)
    residue_idx = np.tile(np.arange(n, dtype=np.int64)[None], (b, 1))
    chains = np.zeros((b, n), np.int64)
    rng = np.random.RandomState(11)
    s_true = rng.randint(0, 21, (b, n)).astype(np.int64)
    order = np.stack([rng.permutation(n) for _ in range(b)]).astype(np.int64)

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(ca), torch.from_numpy(s_true),
            torch.from_numpy(mask), torch.from_numpy(mask),
            torch.from_numpy(residue_idx), torch.from_numpy(chains),
            randn=None, use_input_decoding_order=True,
            decoding_order=torch.from_numpy(order),
        ).numpy()

    fmodel = s2s.ProteinMPNNCA(cfg)
    params = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(ca), jnp.asarray(s_true),
        jnp.asarray(mask), jnp.asarray(mask), jnp.asarray(residue_idx),
        jnp.asarray(chains), jnp.asarray(order),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, n_applied = pconvert.apply_mpnn_state_dict(params, sd, cfg)
    assert n_applied == len(pconvert.mpnn_mapping(cfg))

    got = np.asarray(
        fmodel.apply(
            {"params": params}, jnp.asarray(ca), jnp.asarray(s_true),
            jnp.asarray(mask), jnp.asarray(mask), jnp.asarray(residue_idx),
            jnp.asarray(chains), jnp.asarray(order),
        )
    )
    assert got.shape == ref.shape == (b, n, 21)
    err = np.abs(got - ref).max()
    assert err < 2e-4, f"teacher-forced log-prob mismatch: {err}"

    # sampling path executes with converted weights and respects chain_mask
    fixed = np.ones((b, n), np.float32)
    fixed[:, : n // 2] = 0.0  # first half copies s_true
    samp = s2s.mpnn_sample(
        fmodel, params, jax.random.PRNGKey(3), jnp.asarray(ca),
        jnp.asarray(mask), jnp.asarray(residue_idx), jnp.asarray(chains),
        jnp.asarray(s_true), jnp.asarray(fixed),
    )
    samp = np.asarray(samp)
    assert samp.shape == (b, n)
    np.testing.assert_array_equal(samp[:, : n // 2], s_true[:, : n // 2])
    omit = [s2s.MPNN_ALPHABET.index(a) for a in "CX"]
    assert not np.isin(samp[:, n // 2:], omit).any()


@pytest.mark.torch_parity
def test_esm2_parity_vs_transformers():
    import torch
    from transformers.models.esm import EsmConfig, EsmModel

    torch.manual_seed(2)
    np.random.seed(2)
    cfg = s2s.ESM2Config(embed_dim=64, num_layers=3, attention_heads=4,
                         intermediate_dim=128)
    hf = EsmModel(
        EsmConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.embed_dim,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.attention_heads,
            intermediate_size=cfg.intermediate_dim,
            position_embedding_type="rotary", emb_layer_norm_before=False,
            token_dropout=True, pad_token_id=s2s.ESM_PAD,
            mask_token_id=s2s.ESM_MASK, layer_norm_eps=cfg.layer_norm_eps,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager",  # sdpa can't return attention maps
        ),
        add_pooling_layer=False,
    )
    hf.eval()

    b, t = 2, 14
    rng = np.random.RandomState(5)
    # realistic MPNN_ESM tokens: cls + residues + eos; include a <mask> to
    # exercise the token-dropout rescale; no pads (single chain contract)
    toks = rng.randint(4, 29, (b, t)).astype(np.int64)
    toks[:, 0] = s2s.ESM_CLS
    toks[:, -1] = s2s.ESM_EOS
    toks[0, 5] = s2s.ESM_MASK

    with torch.no_grad():
        out = hf(torch.from_numpy(toks), output_hidden_states=True,
                 output_attentions=True)
    ref_last = out.last_hidden_state.numpy()
    ref_hidden = np.stack([h.numpy() for h in out.hidden_states], 2)
    ref_attn = np.stack([a.numpy() for a in out.attentions], 1)

    fmodel = s2s.ESM2(cfg)
    params = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(toks))["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params, _ = pconvert.apply_esm2_state_dict(params, sd, cfg)
    got = fmodel.apply({"params": params}, jnp.asarray(toks))

    reps = np.asarray(got["representations"])  # (B, T, L+1, C)
    attns = np.asarray(got["attentions"])  # (B, L, H, T, T)
    assert np.abs(reps[:, :, -1] - ref_last).max() < 2e-5
    assert np.abs(reps - ref_hidden).max() < 2e-5
    assert np.abs(attns - ref_attn).max() < 2e-5


def test_mpnn_esm_heads_apply_and_forward():
    cfg = s2s.MPNNESMConfig.tiny()
    model, params = s2s.init_mpnn_esm(cfg, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)

    rng = np.random.RandomState(0)
    nl, c = cfg.esm.num_layers, cfg.esm.embed_dim
    heads = {
        "esm_s_combine": rng.randn(nl + 1).astype(np.float32),
        "esm_p_combine": rng.randn(nl).astype(np.float32),
        "esm_s_mlp.0.weight": rng.randn(c).astype(np.float32),
        "esm_s_mlp.0.bias": rng.randn(c).astype(np.float32),
        "esm_s_mlp.1.weight": rng.randn(cfg.c_s, c).astype(np.float32),
        "esm_s_mlp.1.bias": rng.randn(cfg.c_s).astype(np.float32),
        "esm_s_mlp.3.weight": rng.randn(cfg.c_s, cfg.c_s).astype(np.float32),
        "esm_s_mlp.3.bias": rng.randn(cfg.c_s).astype(np.float32),
        "esm_p_mlp.weight": rng.randn(
            cfg.c_z, nl * cfg.esm.attention_heads
        ).astype(np.float32),
        "esm_p_mlp.bias": rng.randn(cfg.c_z).astype(np.float32),
    }
    params, n = pconvert.apply_mpnn_esm_heads(params, heads)
    assert n == 10
    np.testing.assert_array_equal(params["esm_s_combine"],
                                  heads["esm_s_combine"])
    np.testing.assert_array_equal(params["esm_s_mlp_0"]["kernel"],
                                  heads["esm_s_mlp.1.weight"].T)

    # corrupt one key -> loud failure (converter strictness contract)
    bad = dict(heads)
    del bad["esm_p_mlp.weight"]
    with pytest.raises(KeyError):
        pconvert.apply_mpnn_esm_heads(params, bad)

    b, n_res = 1, 9
    sc = {
        "aatype": jnp.zeros((b, n_res), jnp.int32),
        "final_atom_positions": jnp.asarray(
            np.pad(_chain_ca(b, n_res, 3)[:, :, None], ((0, 0), (0, 0), (0, 36), (0, 0)))
        ),
    }
    esm_s, esm_p = model.apply({"params": params}, sc,
                               rngs={"struct2seq": jax.random.PRNGKey(1)})
    assert esm_s.shape == (b, cfg.seq_nums, n_res, cfg.c_s)
    assert esm_p.shape == (b, cfg.seq_nums, n_res, n_res, cfg.c_z)
    assert np.isfinite(np.asarray(esm_s)).all()
    assert np.isfinite(np.asarray(esm_p)).all()


def test_struct2seq_conditioned_proteus_forward():
    """With an injected MPNN_ESM the struct2seq flag must actually change
    the Proteus output (gated cross-embedder path executes; the 'no weights
    injected' warning is unreachable)."""
    import dataclasses

    from superdiff_tpu.models.protein.proteus import (
        ProteusConfig, ProteusScoreNetwork,
    )

    pcfg = dataclasses.replace(ProteusConfig.tiny(), struct2seq_enable=True)
    mcfg = s2s.MPNNESMConfig.tiny(c_s=pcfg.node_embed_size,
                                  c_z=pcfg.edge_embed_size)
    mmodel, mparams = s2s.init_mpnn_esm(mcfg, jax.random.PRNGKey(7))
    fn = s2s.make_struct2seq_fn(mmodel, mparams, seed=0)

    b, n = 1, 8
    key = jax.random.PRNGKey(3)
    trans = jax.random.normal(key, (b, n, 3)) * 5.0
    quat = jax.random.normal(jax.random.fold_in(key, 1), (b, n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    feats = {
        "aatype": jnp.zeros((b, n), jnp.int32),
        "residue_index": jnp.tile(jnp.arange(n)[None], (b, 1)),
        "chain_index": jnp.zeros((b, n), jnp.int32),
        "res_mask": jnp.ones((b, n)),
        "fixed_mask": jnp.zeros((b, n)),
        "rigids_t": jnp.concatenate([quat, trans], axis=-1),
        "t": jnp.full((b,), 0.5),
        "ss": jax.nn.one_hot(jnp.full((b, n), 3), 4),
        "adjacency": jax.nn.one_hot(jnp.full((b, n, n), 2), 3),
        "hotspot": jax.nn.one_hot(jnp.zeros((b, n), jnp.int32), 2),
        "torsion_angles_sin_cos": jnp.zeros((b, n, 7, 2)),
    }
    sc = {
        "final_atom_positions": jnp.asarray(
            np.pad(_chain_ca(b, n, 5)[:, :, None],
                   ((0, 0), (0, 0), (0, 36), (0, 0)))
        ),
        "final_atom_mask": jnp.ones((b, n, 37)),
        "active": jnp.float32(1.0),
    }

    net = ProteusScoreNetwork(pcfg, struct2seq_fn=fn)
    params = net.init(jax.random.PRNGKey(0), feats, self_condition=sc,
                      struct2seq=True)["params"]
    # the cross embedder's output projections are zero-initialized (AF2
    # final-init convention), so a fresh init contributes exactly zero;
    # stand in for trained weights to prove the wiring carries through
    import flax

    params = flax.core.unfreeze(params)
    ce = params["embedding_layer"]["struct2seq_cross_embedder"]
    for att in ("template_pointwise_att", "template_columnwise_attention"):
        k = ce[att]["mha"]["linear_o"]["kernel"]
        ce[att]["mha"]["linear_o"]["kernel"] = 0.1 * np.asarray(
            jax.random.normal(jax.random.PRNGKey(hash(att) % 1000), k.shape)
        )

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the round-2 skip-warning must not fire
        out_on = net.apply({"params": params}, feats, self_condition=sc,
                           struct2seq=True)
        out_off = net.apply({"params": params}, feats, self_condition=sc,
                            struct2seq=False)
    # compare the embedding outputs: the rigid-update / distogram heads are
    # all zero-initialized (AF2 final-init), so pred_trans is independent of
    # node/edge at fresh init; node_embed/edge_embed are real outputs too —
    # they carry into the next step's self-conditioning (composition.py:45-94)
    for k in ("node_embed", "edge_embed"):
        d = np.abs(np.asarray(out_on[k]) - np.asarray(out_off[k])).max()
        assert d > 1e-3, (
            f"struct2seq gate had no effect on {k} despite injected MPNN_ESM"
        )

    # without a fn the flag warns and is a no-op (legacy gated behavior)
    net_none = ProteusScoreNetwork(pcfg, struct2seq_fn=None)
    with pytest.warns(UserWarning, match="no MPNN\\+ESM weights"):
        out_skip = net_none.apply({"params": params}, feats,
                                  self_condition=sc, struct2seq=True)
    for k in ("node_embed", "edge_embed", "pred_trans"):
        np.testing.assert_allclose(np.asarray(out_skip[k]),
                                   np.asarray(out_off[k]), atol=1e-6)

    # the esm_rate sub-schedule passes a TRACED 0/1 flag per scan step
    # (composition.py:184-187 / pipelines/protein.py esm_flags): a jitted
    # forward must condition exactly on flagged steps and match the static
    # paths on both settings
    fwd = jax.jit(lambda flag: net.apply(
        {"params": params}, feats, self_condition=sc, struct2seq=flag))
    out_t1 = fwd(jnp.float32(1.0))
    out_t0 = fwd(jnp.float32(0.0))
    for k in ("node_embed", "edge_embed"):
        # jit-vs-eager fusion noise only (well below the >1e-3 gate effect)
        np.testing.assert_allclose(np.asarray(out_t1[k]),
                                   np.asarray(out_on[k]), atol=3e-4)
        np.testing.assert_allclose(np.asarray(out_t0[k]),
                                   np.asarray(out_off[k]), atol=3e-4)
