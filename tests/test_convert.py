"""Weight-converter structural validation (no real weights in this env).

For each mapping entry we synthesize an HF-layout tensor of the shape the
transform must produce from, apply the full conversion, and assert every
destination path exists in the actual Flax parameter trees with matching
shapes — catching path drift between the models and the converter.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.models.sd import convert
from superdiff_tpu.models.sd.clip import CLIPTextConfig, CLIPTextEncoder
from superdiff_tpu.models.sd.unet import SDUNet, SDUNetConfig
from superdiff_tpu.models.sd.vae import VAEConfig, VAEDecoder


def _get(params, path):
    node = params
    for k in path.split("/"):
        assert k in node, f"missing path component {k!r} of {path}"
        node = node[k]
    return node


def _fake_hf_tensors(params, mapping):
    """Invert each transform to build HF-shaped synthetic tensors."""
    tensors = {}
    for dst, src, tf in mapping:
        try:
            target = np.asarray(_get(params, dst))
        except AssertionError:
            continue  # optional entries (conv_shortcut on same-width blocks)
        if tf is convert._conv:
            val = np.random.randn(*np.transpose(target, (3, 2, 0, 1)).shape)
        elif tf is convert._lin:
            val = np.random.randn(*target.T.shape)
        elif tf is convert._proj_conv_or_lin:
            val = np.random.randn(*target.T.shape)  # linear layout branch
        else:
            val = np.random.randn(*target.shape)
        tensors[src] = val.astype(np.float32)
    return tensors


def _roundtrip(params, mapping):
    params = flax.core.unfreeze(jax.tree.map(np.asarray, params))
    tensors = _fake_hf_tensors(params, mapping)
    params, n = convert.apply_mapping(params, tensors, mapping)
    assert n == len(tensors), (n, len(tensors))
    # a mapped tensor actually landed
    dst, src, tf = mapping[0]
    val = tensors[src]
    np.testing.assert_allclose(
        _get(params, dst), tf(val) if tf else val, rtol=1e-6
    )
    return n


def test_unet_mapping_paths_align():
    cfg = SDUNetConfig.tiny()
    unet = SDUNet(cfg)
    params = jax.jit(unet.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 4)), jnp.zeros(()), jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )["params"]
    n = _roundtrip(params, convert.unet_mapping())
    assert n > 200  # tiny config still has the full topology


def test_clip_mapping_paths_align():
    cfg = CLIPTextConfig.tiny()
    text = CLIPTextEncoder(cfg)
    params = jax.jit(text.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.max_length), jnp.int32)
    )["params"]
    n = _roundtrip(params, convert.clip_text_mapping(num_layers=cfg.num_layers))
    assert n > 20


def test_vae_mapping_paths_align():
    cfg = VAEConfig.tiny()
    vae = VAEDecoder(cfg)
    params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cfg.latent_channels))
    )["params"]
    n = _roundtrip(
        params,
        convert.vae_decoder_mapping(
            n_levels=len(cfg.channel_mults), layers_per_block=cfg.layers_per_block
        ),
    )
    assert n > 30
