"""Proteus checkpoint-compat validation.

Same strategy as test_framediff_parity: (1) the converter mapping must cover
the reference ScoreNetwork's 517-tensor state_dict schema exactly
(tests/fixtures/proteus_state_dict_schema.json); (2) the converted Flax
model must reproduce the reference torch model numerically, both without
and WITH template self-conditioning (the triangle-multiplication pair stack
and cross attention paths).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models.protein import convert as pconvert
from superdiff_tpu.models.protein.proteus import ProteusConfig, ProteusScoreNetwork

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "proteus_state_dict_schema.json")
REFERENCE = "/root/reference/applications/proteins/Proteus"


def _get(params, path):
    node = params
    for k in path.split("/"):
        assert k in node, f"flax tree missing {k!r} of {path}"
        node = node[k]
    return node


def _feats(cfg, n=10, b=2, seed=3):
    key = jax.random.PRNGKey(seed)
    trans = jax.random.normal(key, (b, n, 3)) * 5.0
    quat = jax.random.normal(jax.random.fold_in(key, 1), (b, n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    quat = quat * jnp.sign(quat[..., :1])
    return {
        "aatype": jnp.full((b, n), 0, jnp.int32),  # ALA (init_feat default)
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


def test_proteus_mapping_covers_reference_schema():
    schema = json.load(open(FIXTURE))["schema"]
    cfg = ProteusConfig()
    mapping = pconvert.proteus_mapping(cfg)
    mapped = {tk for tk, _, _ in mapping}
    unused = set(pconvert.proteus_unused_keys(cfg))
    assert mapped.isdisjoint(unused)
    assert mapped | unused == set(schema), (
        f"missing={sorted(set(schema) - mapped - unused)[:6]} "
        f"extra={sorted(mapped - set(schema))[:6]}"
    )
    net = ProteusScoreNetwork(cfg)
    feats = _feats(cfg, n=6, b=1)
    params = jax.tree.map(
        np.asarray, net.init(jax.random.PRNGKey(0), feats)["params"]
    )
    for tk, fp, tf in mapping:
        dst = _get(params, fp)
        src_shape = tuple(schema[tk])
        want = src_shape[::-1] if tf == "T" else src_shape
        assert dst.shape == want, (tk, fp, dst.shape, want)


@pytest.mark.torch_parity
@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference tree absent")
def test_proteus_numerical_parity_vs_reference_torch(tmp_path):
    import sys
    import types

    import ml_collections
    import torch

    class _Stub(types.ModuleType):
        __path__ = []

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            full = self.__name__ + "." + name
            sub = _Stub(full)
            sys.modules.setdefault(full, sub)
            return sub

    for m in ("omegaconf", "Bio", "Bio.PDB", "Bio.PDB.Chain", "mdtraj", "GPUtil",
              "hydra", "wandb", "esm", "pytorch3d", "pytorch3d.transforms", "dgl",
              "pyrosetta", "tmtools", "torch_scatter", "torch_cluster",
              "torch_geometric", "deepspeed", "deepspeed.utils", "flash_attn",
              "einops_exts"):
        sys.modules.setdefault(m, _Stub(m))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from proteus_model import score_network  # noqa: E402

    fx = json.load(open(FIXTURE))

    def coerce(node):
        # yaml leaves "1e-5"/"1e9" (no decimal point) as strings; OmegaConf
        # coerces them on typed access, ml_collections does not
        if isinstance(node, dict):
            return {k: coerce(v) for k, v in node.items()}
        if isinstance(node, str):
            try:
                return float(node)
            except ValueError:
                return node
        return node

    mc = coerce(fx["model_conf"])
    # the trunk checks this (older) config key first (ipa_pytorch.py:846)
    mc["ipa"].setdefault("local_triangle_attention", {"enable": False})
    model_conf = ml_collections.ConfigDict(mc)

    torch.manual_seed(0)
    # The openfold-style Linear inits (ipa_pytorch.py trunc_normal via
    # scipy.stats.truncnorm.rvs) draw from NUMPY's global RNG, not torch's:
    # without this seed every run constructs a different random model, which
    # made this test's tolerance margin vary run-to-run (root cause of the
    # round-2 "order-dependent" flake — the framediff parity test consumed
    # numpy RNG first and shifted this model's draw).
    np.random.seed(0)
    tnet = score_network.ScoreNetwork(model_conf).eval()
    # zero-init heads would make the rigids comparison trivial (see the
    # framediff parity test) — perturb everything
    with torch.no_grad():
        for p in tnet.parameters():
            p.add_(0.03 * torch.randn_like(p))
    sd_path = tmp_path / "proteus_test.pkl"
    torch.save({"model": tnet.state_dict()}, str(sd_path))

    cfg = ProteusConfig.from_ckpt_conf(mc)
    net = ProteusScoreNetwork(cfg)
    feats = _feats(cfg, n=40, b=1)  # n must exceed k_neighbour=32
    params = net.init(jax.random.PRNGKey(0), feats)["params"]
    sd, _ = pconvert.load_torch_checkpoint(str(sd_path))
    params, n_applied = pconvert.apply_proteus_state_dict(params, sd, cfg)
    assert n_applied == len(pconvert.proteus_mapping(cfg))

    def torchify(f):
        t = {k: torch.tensor(np.asarray(v)) for k, v in f.items()}
        for k in ("aatype", "residue_index", "chain_index"):
            t[k] = t[k].long()
        return t

    tfeats = torchify(feats)

    from superdiff_tpu.models.protein import all_atom37 as aa

    maps = aa.make_atom14_masks(feats["aatype"])
    tfeats["residx_atom37_to_atom14"] = torch.tensor(
        np.asarray(maps["residx_atom37_to_atom14"])
    ).long()
    tfeats["atom37_atom_exists"] = torch.tensor(
        np.asarray(maps["atom37_atom_exists"])
    )

    # --- step 1: no self-conditioning ---
    out_j = net.apply({"params": params}, feats, self_condition=None)
    with torch.no_grad():
        out_t = tnet(tfeats, self_condition=None, struct2seq=False)

    def cmp(name, a, b, tol=2e-3):
        np.testing.assert_allclose(
            np.asarray(a), b.detach().numpy(), rtol=tol, atol=tol,
            err_msg=name,
        )

    cmp("pred_trans", out_j["pred_trans"], out_t["pred_trans"])
    cmp("pred_rotmats", out_j["pred_rotmats"], out_t["pred_rotmats"])
    cmp("final_atoms", out_j["final_atom_positions"], out_t["final_atom_positions"])
    cmp("aux_dist", out_j["auxiliary"]["dist6d_logits"],
        out_t["auxiliary"]["dist6d_logits"])

    # --- step 2: WITH template self-conditioning (pair stack + cross attn).
    # NOTE the reference ScoreNetwork output carries no node_embed/edge_embed
    # (score_network.py:668-700), so the self_condition_s/z layers never fire
    # in the composition loop — the carry matches that exactly.
    # Feed BIT-IDENTICAL *well-conditioned* self-conditioning to both sides.
    # Using the model's own step-1 atoms here is numerically ill-posed: the
    # idealized reconstruction emits near-collinear atom triples, and
    # atom37_to_torsion_angles is catastrophically fp32-sensitive there
    # (openfold's own docstring warns it "should be run with double
    # precision"; measured: torch fp32 vs fp64 differs by up to 1.5 on such
    # geometry, while on generic positions our JAX port matches torch fp32 to
    # 5e-7). Random positions exercise the identical code path — template
    # feature builders, pair stack, cross attention — without the
    # conditioning cliff.
    sc_pos = np.asarray(
        jax.random.normal(jax.random.PRNGKey(11), feats["aatype"].shape + (37, 3))
        * 8.0,
        np.float32,
    )
    sc_j = {
        "final_atom_positions": jnp.asarray(sc_pos),
        "final_atom_mask": jnp.asarray(tfeats["atom37_atom_exists"].numpy()),
    }
    sc_t = {
        "final_atom_positions": torch.tensor(sc_pos),
        "final_atom_mask": tfeats["atom37_atom_exists"].clone(),
        "aatype": tfeats["aatype"].clone(),
    }
    out2_j = net.apply({"params": params}, feats, self_condition=sc_j)
    with torch.no_grad():
        out2_t = tnet(tfeats, self_condition=sc_t, struct2seq=False)
    cmp("sc pred_trans", out2_j["pred_trans"], out2_t["pred_trans"], tol=2e-3)
    cmp("sc pred_rotmats", out2_j["pred_rotmats"], out2_t["pred_rotmats"], tol=2e-3)

    # --- step 3: multi-template branch (template_embed,
    # score_network.py:445-509) concatenated with the self-condition row.
    # Template features are precomputed ONCE (the reference's data pipeline
    # provides them precomputed too) and fed bit-identically to both sides.
    # Template 2's mask is all-zero to exercise the reference's
    # skip-empty-template loop branch (:455-459) vs our keep-vector zeroing.
    n_templ = 3
    b, n = feats["aatype"].shape
    tkey = jax.random.PRNGKey(21)
    tpos = np.asarray(
        jax.random.normal(tkey, (b, n_templ, n, 37, 3)) * 8.0, np.float32
    )
    taat = np.asarray(
        jax.random.randint(jax.random.fold_in(tkey, 1), (b, n_templ, n), 0, 20),
        np.int64,
    )
    flat_aat = jnp.asarray(taat.reshape(b * n_templ, n))
    tmask37 = np.asarray(
        aa.make_atom14_masks(flat_aat)["atom37_atom_exists"], np.float32
    ).reshape(b, n_templ, n, 37)
    flat_pos = jnp.asarray(tpos.reshape(b * n_templ, n, 37, 3))
    flat_m37 = jnp.asarray(tmask37.reshape(b * n_templ, n, 37))
    tors, alt_tors, tors_mask = aa.atom37_to_torsion_angles(
        flat_aat, flat_pos, flat_m37
    )
    pb, pb_mask = aa.pseudo_beta_fn(flat_aat, flat_pos, flat_m37)
    tb_np = {
        "template_aatype": taat,
        "template_all_atom_positions": tpos,
        "template_all_atom_mask": tmask37,
        "template_pseudo_beta": np.asarray(pb).reshape(b, n_templ, n, 3),
        "template_pseudo_beta_mask": np.asarray(pb_mask).reshape(b, n_templ, n),
        "template_torsion_angles_sin_cos": np.asarray(tors).reshape(
            b, n_templ, n, 7, 2
        ),
        "template_alt_torsion_angles_sin_cos": np.asarray(alt_tors).reshape(
            b, n_templ, n, 7, 2
        ),
        "template_torsion_angles_mask": np.asarray(tors_mask).reshape(
            b, n_templ, n, 7
        ),
        "template_mask": np.array([[1.0, 1.0, 0.0]] * b, np.float32),
    }
    feats3 = dict(feats)
    tfeats3 = dict(tfeats)
    for k, v in tb_np.items():
        feats3[k] = jnp.asarray(v)
        tfeats3[k] = torch.tensor(v)
    out3_j = net.apply({"params": params}, feats3, self_condition=sc_j)
    with torch.no_grad():
        out3_t = tnet(tfeats3, self_condition=sc_t, struct2seq=False)
    cmp("tmpl pred_trans", out3_j["pred_trans"], out3_t["pred_trans"], tol=2e-3)
    cmp("tmpl pred_rotmats", out3_j["pred_rotmats"], out3_t["pred_rotmats"],
        tol=2e-3)
    # the template rows must actually change the output vs step 2
    assert not np.allclose(
        np.asarray(out3_j["pred_trans"]), np.asarray(out2_j["pred_trans"]),
        atol=1e-4,
    )


@pytest.mark.torch_parity
@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference tree absent")
def test_torsion_angles_parity_vs_reference_torch():
    """Our atom37_to_torsion_angles matches the reference's
    prot_to_torsion_angles (proteus_data/all_atom.py:105 ->
    proteus_openfold/data/data_transforms.py:925) bit-closely on
    well-conditioned geometry. (On degenerate/idealized geometry the
    computation is fp32-chaotic in BOTH implementations — see the note in
    the numerical parity test.)"""
    import sys
    import types

    import torch

    class _Stub(types.ModuleType):
        __path__ = []

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            full = self.__name__ + "." + name
            sub = _Stub(full)
            sys.modules.setdefault(full, sub)
            return sub

    for m in ("omegaconf", "Bio", "Bio.PDB", "Bio.PDB.Chain", "mdtraj",
              "GPUtil", "hydra", "wandb", "esm", "pytorch3d",
              "pytorch3d.transforms", "dgl", "pyrosetta", "tmtools",
              "torch_scatter", "torch_cluster", "torch_geometric",
              "deepspeed", "deepspeed.utils", "flash_attn", "einops_exts"):
        sys.modules.setdefault(m, _Stub(m))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from proteus_data import all_atom as t_all_atom  # noqa: E402

    from superdiff_tpu.models.protein import all_atom37 as aa

    rng = np.random.RandomState(7)
    pos = (rng.randn(2, 24, 37, 3) * 8).astype(np.float32)
    # mix of residue types so chi masks and pi-periodic mirrors fire
    aat = rng.randint(0, 20, (2, 24)).astype(np.int64)
    mask = np.asarray(aa.make_atom14_masks(jnp.asarray(aat))["atom37_atom_exists"])

    t_tors, t_mask = t_all_atom.prot_to_torsion_angles(
        torch.tensor(aat), torch.tensor(pos), torch.tensor(mask)
    )
    j_tors, _, j_mask = aa.atom37_to_torsion_angles(
        jnp.asarray(aat), jnp.asarray(pos), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(j_tors), t_tors.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(j_mask), t_mask.numpy())
