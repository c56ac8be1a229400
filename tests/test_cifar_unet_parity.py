"""CIFAR ScoreUNet: numerical parity vs the reference's own Flax ScoreNet.

The reference CIFAR stack is JAX/Flax (``cifar/models/ddpm.py``), so unlike
the protein/CLIP parity tests no torch bridge is needed: the reference model
is imported read-only from /root/reference (its relative imports satisfied
by a synthesized package), initialized, its params converted to our tree by
a path-rewriting mapping, and both forwards compared on the same inputs.

Covers: timestep embedding, temb MLP, conv_in, every ResnetBlockDDPM (norm
-> act -> conv -> +temb -> norm -> act -> conv, NIN shortcut), AttnBlock
(NIN q/k/v/out, C^-0.5 fp32 softmax), Down/Upsample convs, final norm+conv,
and the class-conditioned Embed path. GroupNorm epsilon is flax's 1e-6 in
both (the reference uses nn.GroupNorm defaults).
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superdiff_tpu.models import ScoreUNet
from superdiff_tpu.models.convert_cifar import (
    convert_scorenet_params as convert_ref_params,
)

REF_MODELS = "/root/reference/cifar/models"


@pytest.fixture(scope="module")
def ref_ddpm():
    """Import the reference cifar.models package read-only."""
    pkg = types.ModuleType("refcifar_models")
    pkg.__path__ = [REF_MODELS]
    sys.modules["refcifar_models"] = pkg
    mods = {}
    for name in ("utils", "normalization", "layers", "ddpm"):
        spec = importlib.util.spec_from_file_location(
            f"refcifar_models.{name}", f"{REF_MODELS}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refcifar_models.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _ref_config(conditioned):
    import ml_collections

    cfg = ml_collections.ConfigDict()
    cfg.model = ml_collections.ConfigDict()
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 2
    cfg.model.attn_resolutions = (8,)
    cfg.model.dropout = 0.1
    cfg.model.resamp_with_conv = True
    cfg.model.conditioned = conditioned
    cfg.model.normalization = "GroupNorm"
    cfg.model.nonlinearity = "swish"
    cfg.data = ml_collections.ConfigDict()
    cfg.data.num_classes = 10
    return cfg



@pytest.mark.parametrize("conditioned", [False, True])
def test_cifar_unet_numerical_parity_vs_reference_flax(ref_ddpm, conditioned):
    cfg = _ref_config(conditioned)
    ref_net = ref_ddpm["ddpm"].ScoreNet(cfg)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([0.31, 0.77], jnp.float32) * 999.0
    y = jnp.asarray([3, 7], jnp.int32)

    ref_params = ref_net.init({"params": key}, t, x, y, train=False)["params"]
    ref_out = ref_net.apply({"params": ref_params}, t, x, y, train=False)

    ours = ScoreUNet(
        nf=32, ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(8,),
        dropout=0.1, resamp_with_conv=True,
        num_classes=10 if conditioned else None,
    )
    our_init = ours.init(key, t.reshape(-1, 1, 1, 1), x, y, train=False)["params"]
    converted = convert_ref_params(ref_params)

    # the mapping must cover the tree exactly (same paths, same shapes)
    ref_shapes = jax.tree.map(jnp.shape, converted)
    our_shapes = jax.tree.map(jnp.shape, our_init)
    assert ref_shapes == our_shapes, (
        "converted reference tree does not match ScoreUNet's param tree"
    )

    out = ours.apply(
        {"params": converted}, t.reshape(-1, 1, 1, 1), x, y, train=False
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=2e-4, atol=2e-4,
        err_msg="ScoreUNet diverged from the reference Flax ScoreNet",
    )
