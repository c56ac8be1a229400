"""FrameDiff checkpoint-compat validation.

1. The converter mapping must cover the reference ScoreNetwork's state_dict
   schema EXACTLY (282 tensors recorded from the reference implementation
   into tests/fixtures/framediff_state_dict_schema.json — regenerate with
   scripts/dump_framediff_schema.py), with matching shapes in the Flax tree.
2. Numerical parity: the reference torch model (imported read-only from
   /root/reference with its missing third-party deps stubbed) and our Flax
   rebuild must produce the same rigids/psi from the same random weights.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models.protein import convert as pconvert
from superdiff_tpu.models.protein.framediff import (
    FrameDiffConfig,
    FrameDiffScoreNetwork,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "framediff_state_dict_schema.json")
REFERENCE = "/root/reference/applications/proteins/se3_diffusion"


def _get(params, path):
    node = params
    for k in path.split("/"):
        assert k in node, f"flax tree missing {k!r} of {path}"
        node = node[k]
    return node


def _init_flax(cfg, n=12, b=2):
    net = FrameDiffScoreNetwork(cfg)
    feats = {
        "res_mask": jnp.ones((b, n)),
        "fixed_mask": jnp.zeros((b, n)),
        "seq_idx": jnp.tile(jnp.arange(1, n + 1)[None], (b, 1)),
        "t": jnp.full((b,), 0.5),
        "sc_ca_t": jnp.zeros((b, n, 3)),
        "rigids_t": jnp.concatenate(
            [
                jnp.tile(jnp.array([1.0, 0, 0, 0])[None, None], (b, n, 1)),
                jnp.zeros((b, n, 3)),
            ],
            axis=-1,
        ),
        "torsion_angles_sin_cos": jnp.zeros((b, n, 7, 2)),
    }
    params = net.init(jax.random.PRNGKey(0), feats)["params"]
    return net, params, feats


def test_mapping_covers_reference_schema():
    schema = json.load(open(FIXTURE))["schema"]
    cfg = FrameDiffConfig()
    mapping = pconvert.framediff_mapping(cfg)
    mapped = {tk for tk, _, _ in mapping}
    unused = set(pconvert.framediff_unused_keys(cfg))
    assert mapped.isdisjoint(unused)
    assert mapped | unused == set(schema), (
        f"missing={sorted(set(schema) - mapped - unused)[:5]} "
        f"extra={sorted(mapped - set(schema))[:5]}"
    )
    # every flax destination exists with the transposed shape
    _, params, _ = _init_flax(cfg, n=8, b=1)
    params = jax.tree.map(np.asarray, params)
    for tk, fp, tf in mapping:
        dst = _get(params, fp)
        src_shape = tuple(schema[tk])
        want = src_shape[::-1] if tf == "T" else src_shape
        assert dst.shape == want, (tk, fp, dst.shape, want)


def _load_reference_torch():
    import sys
    import types

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
              "hydra", "wandb", "esm", "pytorch3d", "pytorch3d.transforms"):
        sys.modules.setdefault(m, _Stub(m))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from se3diff_model import score_network  # noqa: E402

    return score_network


@pytest.mark.torch_parity
@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference tree absent")
def test_numerical_parity_vs_reference_torch(tmp_path):
    import ml_collections
    import torch

    score_network = _load_reference_torch()
    fx = json.load(open(FIXTURE))
    mc = fx["model_conf"]
    # yaml parses "1e-5" (no decimal point) as a string; the reference relies
    # on OmegaConf coercion we don't have here
    mc["embed"]["min_bin"] = float(mc["embed"]["min_bin"])
    model_conf = ml_collections.ConfigDict(mc)

    class _NoScoreDiffuser:
        def calc_rot_score(self, r0, r1, t):
            return torch.zeros(1)

        def calc_trans_score(self, x0, x1, t, use_torch=False):
            return torch.zeros(1)

    torch.manual_seed(0)
    # the openfold-style inits (se3diff ipa_pytorch.py trunc_normal) draw
    # from numpy's global RNG — seed it or the model differs run-to-run
    np.random.seed(0)
    tnet = score_network.ScoreNetwork(model_conf, _NoScoreDiffuser()).eval()
    # the reference zero-inits every update/output head ("final" init), which
    # would make rigids/psi comparisons trivially pass (identity function) —
    # perturb ALL weights so the full trunk actually shapes the outputs
    with torch.no_grad():
        for p in tnet.parameters():
            p.add_(0.03 * torch.randn_like(p))
    sd_path = tmp_path / "framediff_test.pkl"
    torch.save({"model": {("module." + k): v for k, v in tnet.state_dict().items()}},
               str(sd_path))

    cfg = FrameDiffConfig()
    net, params, feats = _init_flax(cfg, n=12, b=2)
    # randomize the geometry a bit
    key = jax.random.PRNGKey(3)
    trans = jax.random.normal(key, (2, 12, 3)) * 5.0
    quat = jax.random.normal(jax.random.fold_in(key, 1), (2, 12, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    quat = quat * jnp.sign(quat[..., :1])
    feats["rigids_t"] = jnp.concatenate([quat, trans], axis=-1)
    feats["sc_ca_t"] = jax.random.normal(jax.random.fold_in(key, 2), (2, 12, 3)) * 3.0

    sd, conf = pconvert.load_torch_checkpoint(str(sd_path))
    assert not any(k.startswith("module.") for k in sd)
    params, n_applied = pconvert.apply_framediff_state_dict(params, sd, cfg)
    assert n_applied == len(pconvert.framediff_mapping(cfg))

    out = net.apply({"params": params}, feats)

    tfeats = {
        k: torch.tensor(np.asarray(v))
        for k, v in feats.items()
    }
    tfeats["seq_idx"] = tfeats["seq_idx"].long()
    with torch.no_grad():
        tout = tnet(tfeats)

    # fp32 accumulation through 4 IPA blocks: tiny per-element drift
    np.testing.assert_allclose(
        np.asarray(out["psi"]), tout["psi"].numpy(), rtol=2e-3, atol=5e-4
    )
    # compare geometry as rotation matrices + translations (quat sign-free)
    from superdiff_tpu.models.protein import rigid as R

    ours_rot = np.asarray(R.rigid_rotmat(out["rigids"]))
    ours_trans = np.asarray(R.rigid_trans(out["rigids"]))
    theirs = tout["rigids"].numpy()
    theirs_rot = np.asarray(R.quat_to_rotmat(jnp.asarray(theirs[..., :4])))
    np.testing.assert_allclose(ours_rot, theirs_rot, rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(ours_trans, theirs[..., 4:], rtol=2e-3, atol=2e-3)


def test_framediff_net_drives_composition():
    """The checkpoint-faithful net must plug into the composition pipeline
    (same output contract as IPAScoreNetwork)."""
    from superdiff_tpu.models.protein import SE3Diffuser
    from superdiff_tpu.pipelines.protein import CompositionConfig, compose

    se3 = SE3Diffuser.default()
    cfg = FrameDiffConfig.tiny()
    net, params, feats = _init_flax(cfg, n=8, b=1)
    net = FrameDiffScoreNetwork(cfg, score_calc=se3)
    params = net.init(jax.random.PRNGKey(0), feats)["params"]

    def model(f, t):
        return net.apply({"params": params}, f)

    out = compose(
        jax.random.PRNGKey(0), model, model, se3, n_res=8,
        cfg=CompositionConfig(num_t=3), batch=1,
    )
    assert np.isfinite(np.asarray(out["atom37"])).all()
