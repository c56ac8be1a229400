"""Training state pytree (parity with ``cifar/models/utils.py:30-39``).

The full state — including the PRNG key, EMA parameters and the Kronecker
time-sampler cursor — is checkpointed, so a preempted run resumes bit-exact
(the reference's preemption-resume behavior, ``cifar/run_lib.py:49-52``).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    params_ema: Any
    opt_state: Any
    ema_rate: float = flax.struct.field(pytree_node=False, default=0.9999)
    key: Any = None
    sampler_state: jnp.ndarray = None  # Kronecker sequence cursor u0
    run_id: int = 0  # experiment-tracking resume id (reference: wandbid)
