"""HF diffusers safetensors -> superdiff_tpu Flax parameter conversion.

The reference loads ``CompVis/stable-diffusion-v1-4`` via diffusers
(``applications/images/clip_eval.py:29-43``); this module maps those
checkpoints onto the Flax modules in ``unet.py`` / ``clip.py`` / ``vae.py``.
Torch layouts are transposed to Flax conventions:

  Conv2d  (out, in, kh, kw) -> (kh, kw, in, out)
  Linear  (out, in)         -> (in, out)
  1x1 proj conv             -> Dense (squeeze spatial dims)

No network exists in this environment, so conversion activates only when a
local weights directory (HF snapshot layout: ``unet/…safetensors`` etc.) is
present; everything else runs with random init.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _load_safetensors(path: str) -> Optional[Dict[str, np.ndarray]]:
    if not os.path.exists(path):
        return None
    try:
        from safetensors.numpy import load_file
    except Exception:
        import warnings

        warnings.warn(
            f"{path} exists but the safetensors package is unavailable — "
            "falling back to RANDOM INIT for this module.",
            stacklevel=2,
        )
        return None
    # Read errors on an existing file must propagate, not silently fall
    # back to random init.
    return load_file(path)


def _conv(w):  # torch conv -> flax conv kernel
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # torch linear -> flax dense kernel
    return np.transpose(w, (1, 0))


def _proj_conv_or_lin(w):
    return _lin(w[:, :, 0, 0]) if w.ndim == 4 else _lin(w)


def _geglu_kernel(w):
    # diffusers packs (value|gate) along the output dim: (2F, C) torch ->
    # (C, 2F) flax -> (C, 2, F) stacked (free row-major view; see
    # models/sd/unet._GEGLUProjParams for why the stacked layout exists).
    k = _lin(w)
    return k.reshape(k.shape[0], 2, k.shape[1] // 2)


def _geglu_bias(b):
    return b.reshape(2, b.shape[0] // 2)


def _set(params, path: str, value: np.ndarray):
    keys = path.split("/")
    node = params
    for k in keys[:-1]:
        node = node[k]
    old = node[keys[-1]]
    assert old.shape == value.shape, f"{path}: {old.shape} vs {value.shape}"
    node[keys[-1]] = value.astype(np.float32)


def _resnet_entries(dst: str, src: str):
    return [
        (f"{dst}/norm1/GroupNorm_0/scale", f"{src}.norm1.weight", None),
        (f"{dst}/norm1/GroupNorm_0/bias", f"{src}.norm1.bias", None),
        (f"{dst}/conv1/kernel", f"{src}.conv1.weight", _conv),
        (f"{dst}/conv1/bias", f"{src}.conv1.bias", None),
        (f"{dst}/time_emb_proj/kernel", f"{src}.time_emb_proj.weight", _lin),
        (f"{dst}/time_emb_proj/bias", f"{src}.time_emb_proj.bias", None),
        (f"{dst}/norm2/GroupNorm_0/scale", f"{src}.norm2.weight", None),
        (f"{dst}/norm2/GroupNorm_0/bias", f"{src}.norm2.bias", None),
        (f"{dst}/conv2/kernel", f"{src}.conv2.weight", _conv),
        (f"{dst}/conv2/bias", f"{src}.conv2.bias", None),
        (f"{dst}/conv_shortcut/kernel", f"{src}.conv_shortcut.weight", _conv),
        (f"{dst}/conv_shortcut/bias", f"{src}.conv_shortcut.bias", None),
    ]


def _attn_entries(dst: str, src: str):
    tb = f"{src}.transformer_blocks.0"
    out = [
        (f"{dst}/norm/GroupNorm_0/scale", f"{src}.norm.weight", None),
        (f"{dst}/norm/GroupNorm_0/bias", f"{src}.norm.bias", None),
        (f"{dst}/proj_in/kernel", f"{src}.proj_in.weight", _proj_conv_or_lin),
        (f"{dst}/proj_in/bias", f"{src}.proj_in.bias", None),
        (f"{dst}/proj_out/kernel", f"{src}.proj_out.weight", _proj_conv_or_lin),
        (f"{dst}/proj_out/bias", f"{src}.proj_out.bias", None),
    ]
    blk = f"{dst}/block_0"
    for a in ("attn1", "attn2"):
        out += [
            (f"{blk}/{a}/to_q/kernel", f"{tb}.{a}.to_q.weight", _lin),
            (f"{blk}/{a}/to_k/kernel", f"{tb}.{a}.to_k.weight", _lin),
            (f"{blk}/{a}/to_v/kernel", f"{tb}.{a}.to_v.weight", _lin),
            (f"{blk}/{a}/to_out/kernel", f"{tb}.{a}.to_out.0.weight", _lin),
            (f"{blk}/{a}/to_out/bias", f"{tb}.{a}.to_out.0.bias", None),
        ]
    for i in (1, 2, 3):
        out += [
            (f"{blk}/norm{i}/scale", f"{tb}.norm{i}.weight", None),
            (f"{blk}/norm{i}/bias", f"{tb}.norm{i}.bias", None),
        ]
    out += [
        (f"{blk}/ff_geglu/proj/kernel", f"{tb}.ff.net.0.proj.weight", _geglu_kernel),
        (f"{blk}/ff_geglu/proj/bias", f"{tb}.ff.net.0.proj.bias", _geglu_bias),
        (f"{blk}/ff_out/kernel", f"{tb}.ff.net.2.weight", _lin),
        (f"{blk}/ff_out/bias", f"{tb}.ff.net.2.bias", None),
    ]
    return out


def unet_mapping(n_down: int = 4, layers_per_block: int = 2):
    """(flax path, hf tensor name, transform) triples for the SD UNet."""
    m = [
        ("conv_in/kernel", "conv_in.weight", _conv),
        ("conv_in/bias", "conv_in.bias", None),
        ("time_embed_1/kernel", "time_embedding.linear_1.weight", _lin),
        ("time_embed_1/bias", "time_embedding.linear_1.bias", None),
        ("time_embed_2/kernel", "time_embedding.linear_2.weight", _lin),
        ("time_embed_2/bias", "time_embedding.linear_2.bias", None),
        ("norm_out/GroupNorm_0/scale", "conv_norm_out.weight", None),
        ("norm_out/GroupNorm_0/bias", "conv_norm_out.bias", None),
        ("conv_out/kernel", "conv_out.weight", _conv),
        ("conv_out/bias", "conv_out.bias", None),
    ]
    for i in range(n_down):
        for j in range(layers_per_block):
            m += _resnet_entries(f"down_{i}_res_{j}", f"down_blocks.{i}.resnets.{j}")
            if i != n_down - 1:  # CrossAttn blocks
                m += _attn_entries(f"down_{i}_attn_{j}", f"down_blocks.{i}.attentions.{j}")
        if i != n_down - 1:
            m += [
                (f"down_{i}_downsample/kernel", f"down_blocks.{i}.downsamplers.0.conv.weight", _conv),
                (f"down_{i}_downsample/bias", f"down_blocks.{i}.downsamplers.0.conv.bias", None),
            ]
    m += _resnet_entries("mid_res_0", "mid_block.resnets.0")
    m += _attn_entries("mid_attn", "mid_block.attentions.0")
    m += _resnet_entries("mid_res_1", "mid_block.resnets.1")
    for i in range(n_down):
        for j in range(layers_per_block + 1):
            m += _resnet_entries(f"up_{i}_res_{j}", f"up_blocks.{i}.resnets.{j}")
            if i != 0:  # CrossAttnUpBlocks
                m += _attn_entries(f"up_{i}_attn_{j}", f"up_blocks.{i}.attentions.{j}")
        if i != n_down - 1:
            m += [
                (f"up_{i}_upsample/kernel", f"up_blocks.{i}.upsamplers.0.conv.weight", _conv),
                (f"up_{i}_upsample/bias", f"up_blocks.{i}.upsamplers.0.conv.bias", None),
            ]
    return m


def _has(params, path: str) -> bool:
    node = params
    for k in path.split("/"):
        if not hasattr(node, "__contains__") or k not in node:
            return False
        node = node[k]
    return True


def _is_optional(src: str) -> bool:
    """Diffusers checkpoints carry resnet ``conv_shortcut`` tensors only on
    width-changing resnets; every other mapped tensor is required."""
    return ".conv_shortcut." in src


def apply_mapping(params, tensors: Dict[str, np.ndarray], mapping,
                  unused_prefixes=(), unused_suffixes=()):
    """Write mapped tensors into params and return (params, n_applied).

    Strict contract (mirrors ``models/protein/convert.py:214-245``):

    * raises ``KeyError`` when a required mapped tensor is absent from the
      checkpoint — a handful of renamed keys must fail loudly, not convert
      "successfully" and sample garbage;
    * optional entries (resnet ``conv_shortcut``) must be present in the
      checkpoint exactly when the Flax tree has the module — one-sided
      presence raises;
    * warns on leftover checkpoint tensors not covered by the mapping or the
      ``unused_*`` filters (e.g. VAE encoder tensors on the decode-only path).

    Params may be a plain dict (mutated in place) or a FrozenDict (unfrozen
    into a copy); the *returned* tree is always the updated one — callers
    must use it rather than the input (FrozenDict inputs would otherwise
    silently discard every converted weight)."""
    import warnings

    import flax

    mutable = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    applied = 0
    missing = []
    for dst, src, tf in mapping:
        have_ckpt = src in tensors
        if _is_optional(src):
            have_flax = _has(mutable, dst)
            if have_ckpt != have_flax:
                raise KeyError(
                    f"optional tensor mismatch for {src!r}: present in "
                    f"checkpoint={have_ckpt}, module exists in params="
                    f"{have_flax} — the model config does not match the "
                    "checkpoint topology"
                )
            if not have_ckpt:
                continue
        elif not have_ckpt:
            missing.append(src)
            continue
        val = tensors[src]
        _set(mutable, dst, tf(val) if tf else val)
        applied += 1
    if missing:
        raise KeyError(
            f"checkpoint is missing {len(missing)} required tensors, e.g. "
            f"{missing[:5]}"
        )
    covered = {src for _, src, _ in mapping}
    leftover = sorted(
        k for k in tensors
        if k not in covered
        and not (unused_prefixes and k.startswith(tuple(unused_prefixes)))
        and not (unused_suffixes and k.endswith(tuple(unused_suffixes)))
    )
    if leftover:
        warnings.warn(
            f"{len(leftover)} unconverted checkpoint tensors: {leftover[:8]}",
            stacklevel=2,
        )
    return mutable, applied


def clip_text_mapping(num_layers: int = 12):
    """(flax path, hf tensor name, transform) for the CLIP text tower."""
    pre = "text_model"
    m = [
        ("token_embedding/embedding", f"{pre}.embeddings.token_embedding.weight", None),
        ("position_embedding", f"{pre}.embeddings.position_embedding.weight", None),
        ("final_layer_norm/scale", f"{pre}.final_layer_norm.weight", None),
        ("final_layer_norm/bias", f"{pre}.final_layer_norm.bias", None),
    ]
    for i in range(num_layers):
        src = f"{pre}.encoder.layers.{i}"
        dst = f"layer_{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m += [
                (f"{dst}/self_attn/{p}/kernel", f"{src}.self_attn.{p}.weight", _lin),
                (f"{dst}/self_attn/{p}/bias", f"{src}.self_attn.{p}.bias", None),
            ]
        for ln in ("layer_norm1", "layer_norm2"):
            m += [
                (f"{dst}/{ln}/scale", f"{src}.{ln}.weight", None),
                (f"{dst}/{ln}/bias", f"{src}.{ln}.bias", None),
            ]
        m += [
            (f"{dst}/fc1/kernel", f"{src}.mlp.fc1.weight", _lin),
            (f"{dst}/fc1/bias", f"{src}.mlp.fc1.bias", None),
            (f"{dst}/fc2/kernel", f"{src}.mlp.fc2.weight", _lin),
            (f"{dst}/fc2/bias", f"{src}.mlp.fc2.bias", None),
        ]
    return m


def _vae_resnet(dst: str, src: str):
    return [
        (f"{dst}/norm1/GroupNorm_0/scale", f"{src}.norm1.weight", None),
        (f"{dst}/norm1/GroupNorm_0/bias", f"{src}.norm1.bias", None),
        (f"{dst}/conv1/kernel", f"{src}.conv1.weight", _conv),
        (f"{dst}/conv1/bias", f"{src}.conv1.bias", None),
        (f"{dst}/norm2/GroupNorm_0/scale", f"{src}.norm2.weight", None),
        (f"{dst}/norm2/GroupNorm_0/bias", f"{src}.norm2.bias", None),
        (f"{dst}/conv2/kernel", f"{src}.conv2.weight", _conv),
        (f"{dst}/conv2/bias", f"{src}.conv2.bias", None),
        (f"{dst}/shortcut/kernel", f"{src}.conv_shortcut.weight", _conv),
        (f"{dst}/shortcut/bias", f"{src}.conv_shortcut.bias", None),
    ]


def vae_decoder_mapping(n_levels: int = 4, layers_per_block: int = 2):
    """(flax path, hf tensor name, transform) for the VAE decoder path."""
    m = [
        ("post_quant_conv/kernel", "post_quant_conv.weight", _conv),
        ("post_quant_conv/bias", "post_quant_conv.bias", None),
        ("conv_in/kernel", "decoder.conv_in.weight", _conv),
        ("conv_in/bias", "decoder.conv_in.bias", None),
        ("norm_out/GroupNorm_0/scale", "decoder.conv_norm_out.weight", None),
        ("norm_out/GroupNorm_0/bias", "decoder.conv_norm_out.bias", None),
        ("conv_out/kernel", "decoder.conv_out.weight", _conv),
        ("conv_out/bias", "decoder.conv_out.bias", None),
    ]
    m += _vae_resnet("mid_res_0", "decoder.mid_block.resnets.0")
    m += _vae_resnet("mid_res_1", "decoder.mid_block.resnets.1")
    att = "decoder.mid_block.attentions.0"
    m += [
        ("mid_attn/norm/GroupNorm_0/scale", f"{att}.group_norm.weight", None),
        ("mid_attn/norm/GroupNorm_0/bias", f"{att}.group_norm.bias", None),
        ("mid_attn/q/kernel", f"{att}.to_q.weight", _proj_conv_or_lin),
        ("mid_attn/q/bias", f"{att}.to_q.bias", None),
        ("mid_attn/k/kernel", f"{att}.to_k.weight", _proj_conv_or_lin),
        ("mid_attn/k/bias", f"{att}.to_k.bias", None),
        ("mid_attn/v/kernel", f"{att}.to_v.weight", _proj_conv_or_lin),
        ("mid_attn/v/bias", f"{att}.to_v.bias", None),
        ("mid_attn/proj_out/kernel", f"{att}.to_out.0.weight", _proj_conv_or_lin),
        ("mid_attn/proj_out/bias", f"{att}.to_out.0.bias", None),
    ]
    for i in range(n_levels):
        for j in range(layers_per_block + 1):
            m += _vae_resnet(f"up_{i}_res_{j}", f"decoder.up_blocks.{i}.resnets.{j}")
        if i != n_levels - 1:
            m += [
                (f"up_{i}_conv/kernel", f"decoder.up_blocks.{i}.upsamplers.0.conv.weight", _conv),
                (f"up_{i}_conv/bias", f"decoder.up_blocks.{i}.upsamplers.0.conv.bias", None),
            ]
    return m


def _required_count(mapping) -> int:
    return sum(1 for _, src, _ in mapping if not _is_optional(src))


def load_sd_weights(weights_dir: str, unet_params, text_params, vae_params,
                    *, clip_num_layers: int = 12, unet_n_down: int = 4,
                    unet_layers_per_block: int = 2, vae_n_levels: int = 4,
                    vae_layers_per_block: int = 2):
    """Load an HF snapshot directory; returns possibly-updated param trees.

    Each sub-conversion is strict (see :func:`apply_mapping`): any missing
    required tensor raises, so a successful return means every mapped tensor
    landed. The exact-count asserts are derived from the mappings themselves.
    """
    unet_t = _load_safetensors(
        os.path.join(weights_dir, "unet", "diffusion_pytorch_model.safetensors")
    )
    if unet_t:
        mapping = unet_mapping(n_down=unet_n_down,
                               layers_per_block=unet_layers_per_block)
        unet_params, n = apply_mapping(unet_params, unet_t, mapping)
        assert n >= _required_count(mapping), (n, _required_count(mapping))
    text_t = _load_safetensors(
        os.path.join(weights_dir, "text_encoder", "model.safetensors")
    )
    if text_t:
        mapping = clip_text_mapping(num_layers=clip_num_layers)
        text_params, n = apply_mapping(
            text_params, text_t, mapping,
            # transformers' registered buffer; also the projection head of
            # CLIPModel-format dumps — neither feeds the text tower forward
            unused_suffixes=(".position_ids",),
            unused_prefixes=("text_projection",),
        )
        assert n == _required_count(mapping), (n, _required_count(mapping))
    vae_t = _load_safetensors(
        os.path.join(weights_dir, "vae", "diffusion_pytorch_model.safetensors")
    )
    if vae_t:
        mapping = vae_decoder_mapping(n_levels=vae_n_levels,
                                      layers_per_block=vae_layers_per_block)
        vae_params, n = apply_mapping(
            vae_params, vae_t, mapping,
            # decode-only path: the encoder tower and quant_conv are unused
            # (reference uses vae.decode only, clip_eval.py:46-60)
            unused_prefixes=("encoder.", "quant_conv."),
        )
        assert n >= _required_count(mapping), (n, _required_count(mapping))
    return unet_params, text_params, vae_params
