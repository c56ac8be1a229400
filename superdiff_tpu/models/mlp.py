"""Toy MLP score network for low-dimensional experiments.

Equivalent role to the educational notebook's 2-D score net
(``notebooks/superposition_edu.ipynb`` cells 4-9): small enough to train in
seconds, used by the test suite as the executable spec of the superposition
algorithm (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLPScoreNet(nn.Module):
    """MLP score net: input (t, x) -> sigma-scaled score of x's dimension."""

    hidden: Sequence[int] = (256, 256, 256)
    out_dim: int = 2

    @nn.compact
    def __call__(self, t: jnp.ndarray, x: jnp.ndarray, y=None, train: bool = False):
        del y, train
        t = jnp.broadcast_to(jnp.reshape(t, (-1, 1)), (x.shape[0], 1))
        # Fourier features of t stabilize conditioning across the [0,1] range.
        freqs = 2.0 ** jnp.arange(6, dtype=x.dtype) * jnp.pi
        temb = jnp.concatenate([jnp.sin(t * freqs), jnp.cos(t * freqs)], axis=-1)
        h = jnp.concatenate([x, temb], axis=-1)
        for width in self.hidden:
            h = nn.swish(nn.Dense(width)(h))
        return nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros)(h)
