"""Mesh-era training step: jit + NamedSharding instead of pmap.

Replaces the reference's ``jax.pmap(step_fn, axis_name='batch')`` +
``lax.pmean`` pattern (``cifar/run_lib.py:75``, ``cifar/train_utils.py:25-51``):
under ``jit`` with a batch-sharded input and replicated parameters, XLA
inserts the gradient all-reduce over ICI automatically — no per-device
leading dims, no ``flax_utils.replicate``, no host-side unreplicate for
checkpointing.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .state import TrainState


def make_optimizer(
    lr: float = 2e-4,
    warmup: int = 5_000,
    beta1: float = 0.9,
    eps: float = 1e-8,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """Adam + linear warmup + global-value clip (``cifar/train_utils.py:13-22``).

    Note the reference uses ``optax.clip`` (elementwise), not
    ``clip_by_global_norm`` — kept for parity.
    """
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
        boundaries=[warmup],
    )
    return optax.chain(
        optax.clip(grad_clip),
        optax.adam(learning_rate=schedule, b1=beta1, eps=eps),
    )


def init_train_state(
    key: jax.Array,
    params,
    optimizer: optax.GradientTransformation,
    ema_rate: float = 0.9999,
    run_id: int = 0,
) -> TrainState:
    return TrainState(
        step=jnp.asarray(1, jnp.int32),
        params=params,
        params_ema=params,
        opt_state=optimizer.init(params),
        ema_rate=ema_rate,
        key=key,
        sampler_state=jnp.asarray(0.5, jnp.float32),
        run_id=run_id,
    )


def make_train_step(
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
):
    # donate=True halves state memory (in-place update) but is rejected by
    # some remote-device runtimes (axon tunnel: InvalidArgument); opt-in.
    """Build the jitted DSM train step.

    ``loss_fn(key, params, sampler_state, batch) -> (loss, next_sampler_state)``.
    With a mesh, the state is replicated and the batch sharded over 'data';
    XLA reduces gradients across devices (the pmean of
    ``cifar/train_utils.py:32,47`` becomes an implicit psum).
    """

    def step_fn(state: TrainState, batch):
        key, iter_key = jax.random.split(state.key)
        grad_fn = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)
        (loss, next_sampler_state), grads = grad_fn(
            iter_key, state.params, state.sampler_state, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_rate
        new_ema = jax.tree.map(
            lambda pe, p: pe * ema + p * (1.0 - ema), state.params_ema, new_params
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            params_ema=new_ema,
            opt_state=opt_state,
            key=key,
            sampler_state=next_sampler_state,
        )
        return new_state, loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from ..parallel.mesh import dp_spec

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, dp_spec(mesh))
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
