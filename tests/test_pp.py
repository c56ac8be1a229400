"""Pipeline parallelism: value + gradient exactness on the 8-device mesh.

The reference has no pipeline parallelism (SURVEY.md §2.5);
``parallel/pp.py`` is beyond-reference capability, so the contract is
equality against the sequential stage stack — forward AND backward (the
schedule is one differentiable ``lax.scan``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from superdiff_tpu.parallel.pp import pipeline


def _mesh(n=8, name="pp"):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


def _stage(p, x):
    # residual MLP block — same signature/shape contract as the protein
    # trunk blocks this primitive targets
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _stack(key, n, d):
    kw, kb = jax.random.split(key)
    return {
        "w": 0.3 * jax.random.normal(kw, (n, d, d)),
        "b": 0.1 * jax.random.normal(kb, (n, d)),
    }


def _seq(params, x, n):
    for i in range(n):
        x = _stage(jax.tree.map(lambda a: a[i], params), x)
    return x


def test_pipeline_matches_sequential():
    n, d = 8, 16
    params = _stack(jax.random.PRNGKey(0), n, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, d))
    out = pipeline(_stage, params, x, _mesh(n))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_seq(params, x, n)), atol=1e-6
    )


def test_pipeline_gradients_match_sequential():
    n, d = 8, 8
    params = _stack(jax.random.PRNGKey(2), n, d)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, d))
    mesh = _mesh(n)

    def loss_pp(p, xx):
        return jnp.sum(pipeline(_stage, p, xx, mesh, n_micro=4) ** 2)

    def loss_seq(p, xx):
        return jnp.sum(_seq(p, xx, n) ** 2)

    gp = jax.grad(loss_pp, argnums=(0, 1))(params, x)
    gs = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pipeline_under_jit_explicit_micro():
    n, d = 8, 4
    params = _stack(jax.random.PRNGKey(4), n, d)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, d))
    mesh = _mesh(n)
    out = jax.jit(
        lambda p, xx: pipeline(_stage, p, xx, mesh, n_micro=32)
    )(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_seq(params, x, n)), atol=1e-6
    )


def test_pipeline_micro_smaller_than_stages():
    # M < N still exact (all-bubble regime)
    n, d = 8, 4
    params = _stack(jax.random.PRNGKey(6), n, d)
    x = jax.random.normal(jax.random.PRNGKey(7), (6, d))
    out = pipeline(_stage, params, x, _mesh(n), n_micro=2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_seq(params, x, n)), atol=1e-6
    )


def test_pipeline_rejects_bad_shapes():
    n, d = 8, 4
    params = _stack(jax.random.PRNGKey(8), n, d)
    x = jnp.zeros((9, d))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline(_stage, params, x, _mesh(n), n_micro=4)
    bad = jax.tree.map(lambda a: a[:4], params)
    with pytest.raises(ValueError, match="leading axes"):
        pipeline(_stage, bad, x[:8], _mesh(n))
