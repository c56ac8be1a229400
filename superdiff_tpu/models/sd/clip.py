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
        h = nn.LayerNorm(dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(dtype=jnp.float32, name="layer_norm2")(x)
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
        x = nn.LayerNorm(dtype=jnp.float32, name="final_layer_norm")(x)
        return x.astype(jnp.float32)


class Tokenizer:
    """HF CLIPTokenizer when available, deterministic fallback otherwise."""

    def __init__(self, cfg: CLIPTextConfig, hf_path: Optional[str] = None):
        self.cfg = cfg
        self._hf = None
        if hf_path:
            try:
                from transformers import CLIPTokenizer

                self._hf = CLIPTokenizer.from_pretrained(hf_path)
            except Exception:
                self._hf = None

    def __call__(self, prompts: list[str]) -> np.ndarray:
        c = self.cfg
        if self._hf is not None:
            out = self._hf(
                prompts, padding="max_length", max_length=c.max_length,
                truncation=True, return_tensors="np",
            )
            return out["input_ids"].astype(np.int32)
        # fallback: bos, per-word hash tokens, eos, pad with eos
        ids = np.full((len(prompts), c.max_length), 2, dtype=np.int32)  # eos-ish pad
        ids[:, 0] = 1
        for i, p in enumerate(prompts):
            toks = [3 + (hash(w) % (c.vocab_size - 4)) for w in p.lower().split()]
            toks = toks[: c.max_length - 2]
            ids[i, 1 : 1 + len(toks)] = toks
            ids[i, 1 + len(toks)] = 2
        return ids
