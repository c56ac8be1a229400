"""Training-stack tests: DSM loss, mesh train step, ensemble superposition.

Runs on the 8-device virtual CPU mesh (conftest), exercising the same
jit+NamedSharding paths used on a real TPU slice.
"""

import jax
import jax.numpy as jnp
import numpy as np

from superdiff_tpu.core import (
    VPSchedule,
    SuperposeConfig,
    kronecker_times,
    make_dsm_loss,
    superpose,
)
from superdiff_tpu.models import MLPScoreNet, make_stacked_score_fn, stack_params
from superdiff_tpu.parallel import make_mesh, shard_batch
from superdiff_tpu.train import init_train_state, make_optimizer, make_train_step

SCHED = VPSchedule()


def test_kronecker_times_parity():
    """Matches cifar/dynamics.py:9-13 for the single-host case."""
    import math

    bs, u0 = 16, 0.5
    t, next_u0 = kronecker_times(bs, jnp.asarray(u0), 0.0, 1.0)
    expect = (u0 + math.sqrt(2.0) * np.arange(bs)) % 1.0
    np.testing.assert_allclose(np.asarray(t), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(next_u0), expect[-1], rtol=1e-5)
    # sharded variant slices the global sequence
    t1, _ = kronecker_times(8, jnp.asarray(u0), 0.0, 1.0, num_shards=2, shard_index=1)
    expect2 = (u0 + math.sqrt(2.0) * np.arange(16)) % 1.0
    np.testing.assert_allclose(np.asarray(t1), expect2[8:], rtol=1e-5)


def _train_model(key, mu, n_iters=1500, mesh=None):
    model = MLPScoreNet(hidden=(128, 128), out_dim=2)
    params = model.init(key, jnp.zeros((1, 1)), jnp.zeros((1, 2)))["params"]

    def apply_fn(p, t, x, y, rng=None):
        return model.apply({"params": p}, t, x)

    loss_fn = make_dsm_loss(apply_fn, SCHED, t_0=1e-3)
    opt = make_optimizer(lr=2e-3, warmup=50)
    state = init_train_state(key, params, opt, ema_rate=0.99)
    step = make_train_step(opt, loss_fn, mesh=mesh, donate=False)

    @jax.jit
    def data(k):
        return mu + 0.25 * jax.random.normal(k, (256, 2))

    losses = []
    for i in range(n_iters):
        batch = {"image": data(jax.random.fold_in(key, i))}
        if mesh is not None:
            batch = shard_batch({"image": np.asarray(batch["image"])}, mesh)
        state, loss = step(state, batch)
        losses.append(float(loss))
    return model, state, losses


def test_mesh_train_step_learns_2d_gaussian():
    mesh = make_mesh(model=1)
    model, state, losses = _train_model(
        jax.random.PRNGKey(0), jnp.asarray([2.0, 2.0]), n_iters=300, mesh=mesh
    )
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) * 0.6, (
        np.mean(losses[:20]),
        np.mean(losses[-20:]),
    )
    assert int(state.step) == 301


def test_two_trained_models_superpose_or():
    """End-to-end 2-D superposition with trained nets (the executable spec of
    superposition_edu.ipynb, SURVEY.md §4a)."""
    model, state_a, _ = _train_model(jax.random.PRNGKey(0), jnp.asarray([2.0, 2.0]))
    _, state_b, _ = _train_model(jax.random.PRNGKey(1), jnp.asarray([-2.0, -2.0]))

    def apply_fn(p, t, x, y=None):
        return model.apply({"params": p}, t, x)

    stacked = stack_params([state_a.params, state_b.params])
    score_fn = make_stacked_score_fn(apply_fn, stacked)
    cfg = SuperposeConfig(n_steps=400, mode="sde", operator="or")
    x1 = jax.random.normal(jax.random.PRNGKey(7), (128, 2))
    x0, logq, _ = jax.jit(
        lambda k, x: superpose(k, x, score_fn, SCHED, cfg, n_models=2)
    )(jax.random.PRNGKey(8), x1)
    x0 = np.asarray(x0)
    d_a = np.linalg.norm(x0 - np.array([2.0, 2.0]), axis=-1)
    d_b = np.linalg.norm(x0 + np.array([2.0, 2.0]), axis=-1)
    close = np.minimum(d_a, d_b)
    assert np.mean(close < 1.5) > 0.9, close
    frac_a = np.mean(d_a < d_b)
    assert 0.15 < frac_a < 0.85, frac_a
    # OR commits: the winning model's running ll dominates per sample
    w = np.asarray(jax.nn.softmax(1e6 * logq, axis=-1))
    assert np.all(np.max(w, axis=-1) > 0.999)
