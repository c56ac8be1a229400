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
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a stacked oracle ``(t, x) -> (N, B, *event)`` from one apply.

    ``apply_fn(params, t, x, y)`` is vmapped over the parameter stack only;
    (t, x, labels) broadcast. The result feeds ``core.superpose``.
    """

    def single(params, t, x):
        t_b = jnp.broadcast_to(
            jnp.asarray(t, x.dtype), (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        return apply_fn(params, t_b, x, labels)

    vmapped = jax.vmap(single, in_axes=(0, None, None))

    def score_fn(t, x):
        return vmapped(stacked_params, t, x)

    return score_fn
