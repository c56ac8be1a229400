"""Model-ensemble parallelism: run N same-architecture denoisers as one call.

The reference evaluates the N composed models *serially* per step
(``cifar/dynamics.py:81-88`` Python loop). On TPU the N forwards are
embarrassingly parallel: we stack the parameter pytrees along a leading axis
and ``vmap`` a single apply, which XLA lowers to batched MXU matmuls/convs —
one dispatch, N-fold arithmetic intensity. Optionally the stacked axis can be
sharded over a mesh ``'model'`` axis (see ``superdiff_tpu.parallel``), placing
each denoiser's weights on its own chip group with no weight gathering.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

Params = Any


def stack_params(params_list: Sequence[Params]) -> Params:
    """Stack N identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def unstack_params(stacked: Params, n: int) -> list[Params]:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def make_stacked_score_fn(
    apply_fn: Callable[..., jax.Array],
    stacked_params: Params,
    labels=None,
    mode: str = "unroll",
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a stacked oracle ``(t, x) -> (N, B, *event)`` from one apply.

    ``apply_fn(params, t, x, y)``; (t, x, labels) broadcast across the N
    parameter sets. The result feeds ``core.superpose``.

    mode:
      * "unroll" (default) — trace N plain forwards inside one program.
        Measured faster on TPU for small N: vmapping convs over a weight
        stack lowers to grouped convolutions, which XLA tiles worse than N
        ordinary convs (~6% on the CIFAR ScoreUNet, N=2).
      * "vmap" — single batched call over the stacked axis; required when
        the stack is sharded over a mesh 'model' axis (ensemble parallelism)
        so each shard executes only its own slice.
    """

    def single(params, t, x):
        t_b = jnp.broadcast_to(
            jnp.asarray(t, x.dtype), (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        return apply_fn(params, t_b, x, labels)

    if mode == "vmap":
        vmapped = jax.vmap(single, in_axes=(0, None, None))

        def score_fn(t, x):
            return vmapped(stacked_params, t, x)

        return score_fn

    n = jax.tree.leaves(stacked_params)[0].shape[0]
    per_model = unstack_params(stacked_params, n)

    def score_fn(t, x):
        return jnp.stack([single(p, t, x) for p in per_model], axis=0)

    return score_fn
