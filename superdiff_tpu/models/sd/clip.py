"""CLIP text encoder (ViT-L/14 text tower), Flax, for SD conditioning.

Equivalent of the ``CLIPTextModel`` the reference loads
(``applications/images/clip_eval.py:31-33``): 12-layer causal transformer,
width 768, 12 heads, quick-GELU, final LayerNorm; returns the full
last-hidden-state sequence (77 x 768) consumed as UNet cross-attention
context. Tokenization: the HF ``CLIPTokenizer`` is used when available
(transformers is in this image and needs no network for tokenizing if the
vocab is cached); otherwise a deterministic hash-token fallback keeps the
pipeline runnable for benchmarking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)
        b, l, _ = x.shape
        q = q.reshape(b, l, c.num_heads, head_dim)
        k = k.reshape(b, l, c.num_heads, head_dim)
        v = v.reshape(b, l, c.num_heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (head_dim**-0.5) + mask
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(self.cfg.hidden_size * 4, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        c = self.cfg
        b, l = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_length, c.hidden_size),
        )
        x = tok + pos[None, :l].astype(self.dtype)
        causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        for i in range(c.num_layers):
            x = CLIPLayer(c, self.dtype, name=f"layer_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
        return x.astype(jnp.float32)


class Tokenizer:
    """HF CLIPTokenizer when available, deterministic fallback otherwise.

    ``hf_path`` is the SD snapshot root (the directory passed as
    ``weights_dir``); in the HF SD layout the tokenizer files live under its
    ``tokenizer/`` subfolder (``clip_eval.py:30`` loads subfolder
    ``"tokenizer"``). Both the subfolder and the root are tried. When a path
    WAS given but no tokenizer loads, the hash fallback would silently feed
    garbage conditioning to real weights — warn loudly.
    """

    def __init__(self, cfg: CLIPTextConfig, hf_path: Optional[str] = None):
        import os
        import warnings

        self.cfg = cfg
        self._hf = None
        if hf_path:
            try:
                from transformers import CLIPTokenizer

                for candidate in (os.path.join(hf_path, "tokenizer"), hf_path):
                    if not os.path.isdir(candidate):
                        continue
                    try:
                        self._hf = CLIPTokenizer.from_pretrained(
                            candidate, local_files_only=True
                        )
                        break
                    except Exception:
                        continue
            except Exception:
                self._hf = None
            if self._hf is None:
                warnings.warn(
                    f"No CLIPTokenizer found under {hf_path!r} (tried "
                    "'tokenizer/' subfolder and the root). Falling back to "
                    "hash-based fake tokens — text conditioning will be "
                    "GARBAGE with real weights.",
                    stacklevel=2,
                )

    # CLIP's real special-token ids; the fallback must use them so that a
    # partially-real setup (converted weights + missing tokenizer files) at
    # least sees the correct BOS/EOS embeddings.
    BOS = 49406
    EOS = 49407

    def __call__(self, prompts: list[str]) -> np.ndarray:
        c = self.cfg
        if self._hf is not None:
            out = self._hf(
                prompts, padding="max_length", max_length=c.max_length,
                truncation=True, return_tensors="np",
            )
            return out["input_ids"].astype(np.int32)
        # fallback: bos, per-word hash tokens, eos, pad with eos
        bos = self.BOS if self.BOS < c.vocab_size else 1
        eos = self.EOS if self.EOS < c.vocab_size else 2
        ids = np.full((len(prompts), c.max_length), eos, dtype=np.int32)
        ids[:, 0] = bos
        import zlib

        for i, p in enumerate(prompts):
            # crc32, not hash(): Python string hashing is salted per process
            # (PYTHONHASHSEED), which would make seeded runs irreproducible
            toks = [
                3 + (zlib.crc32(w.encode()) % (c.vocab_size - 4))
                for w in p.lower().split()
            ]
            toks = toks[: c.max_length - 2]
            ids[i, 1 : 1 + len(toks)] = toks
            ids[i, 1 + len(toks)] = eos
        return ids
