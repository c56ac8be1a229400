"""Sequence-parallel (ring) attention: exactness on the 8-device mesh.

The reference has no sequence/context parallelism (SURVEY.md §2.5);
``parallel/sp.py`` is beyond-reference capability, so the contract is
equality against single-device attention, not reference parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from superdiff_tpu.ops.pallas.flash_attention import _reference
from superdiff_tpu.parallel.sp import ring_attention


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _qkv(key, b, l, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, l, h, d), dtype),
        jax.random.normal(kk, (b, l, h, d), dtype),
        jax.random.normal(kv, (b, l, h, d), dtype),
    )


def test_ring_matches_reference_fp32():
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 64, 4, 16)
    mesh = _mesh((8,), ("sp",))
    out = ring_attention(q, k, v, mesh)
    ref = _reference(q, k, v, sm_scale=1.0 / 4.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_matches_reference_bf16():
    q, k, v = _qkv(jax.random.PRNGKey(1), 1, 128, 2, 8, jnp.bfloat16)
    mesh = _mesh((8,), ("sp",))
    out = ring_attention(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    ref = _reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        sm_scale=1.0 / (8**0.5),
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_ring_composes_with_data_axis():
    q, k, v = _qkv(jax.random.PRNGKey(2), 4, 32, 2, 16)
    mesh = _mesh((2, 4), ("data", "sp"))
    out = ring_attention(q, k, v, mesh, batch_axis="data")
    ref = _reference(q, k, v, sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_under_jit_with_custom_scale():
    q, k, v = _qkv(jax.random.PRNGKey(3), 2, 40, 2, 12)
    mesh = _mesh((8,), ("sp",))
    out = jax.jit(
        lambda a, b, c: ring_attention(a, b, c, mesh, sm_scale=0.11)
    )(q, k, v)
    ref = _reference(q, k, v, sm_scale=0.11)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_rejects_ragged_sequence():
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 36, 2, 8)
    mesh = _mesh((8,), ("sp",))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, mesh)
