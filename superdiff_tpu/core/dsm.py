"""Denoising score-matching loss and low-discrepancy time sampling.

Rebuild of the reference's training objective (``cifar/dynamics.py:29-45``):
epsilon-matching under the VP forward kernel, with a Kronecker
(additive-recurrence) low-discrepancy time sampler that is multi-host aware
(``cifar/dynamics.py:9-13``).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def kronecker_times(
    batch_size: int,
    u0: Array,
    t_0: float,
    t_1: float,
    *,
    num_shards: int = 1,
    shard_index: int = 0,
) -> Tuple[Array, Array]:
    """Low-discrepancy time grid: ``(u0 + sqrt(2) * arange) mod 1``.

    The global sequence spans ``batch_size * num_shards`` points; each host
    takes its contiguous slice (parity with ``cifar/dynamics.py:9-13``, where
    sharding is by ``jax.process_index()``). Returns (t, next_u0).
    """
    n = batch_size * num_shards
    u = (u0 + math.sqrt(2.0) * jnp.arange(n)) % 1.0
    next_u0 = u[-1]
    lo = shard_index * batch_size
    t = (t_1 - t_0) * jax.lax.dynamic_slice_in_dim(u, lo, batch_size) + t_0
    return t, next_u0


def make_dsm_loss(
    apply_fn: Callable[..., Array],
    schedule,
    *,
    t_0: float = 0.0,
    t_1: float = 1.0,
    num_shards: int = 1,
    shard_index: int = 0,
):
    """Epsilon-matching DSM loss closure.

    ``apply_fn(params, t, x, y, rng)`` must return the model's sigma-scaled
    score prediction (the ``-eps_hat`` convention). Loss is
    ``mean_b sum_event (eps + pred)^2`` (``cifar/dynamics.py:43-45``).
    """

    def loss_fn(key, params, sampler_state, batch):
        data = batch["image"]
        labels = batch.get("label")
        bs = data.shape[0]
        time_key, noise_key, drop_key = jax.random.split(key, 3)
        del time_key  # times come from the deterministic Kronecker sequence
        t, next_state = kronecker_times(
            bs, sampler_state, t_0, t_1, num_shards=num_shards, shard_index=shard_index
        )
        t = t.reshape((bs,) + (1,) * (data.ndim - 1))
        eps = jax.random.normal(noise_key, data.shape, dtype=data.dtype)
        x_t = schedule.marginal(data, eps, t)
        pred = apply_fn(params, t, x_t, labels, drop_key)
        per_sample = jnp.sum((eps + pred) ** 2, axis=tuple(range(1, data.ndim)))
        return per_sample.mean(), next_state

    return loss_fn
