"""Pipeline parallelism (GPipe-style) over a device mesh.

Beyond the reference's parallelism story: the reference has **no pipeline
parallelism** (SURVEY.md §2.5 — every model it runs fits one GPU). This
module adds the TPU-native PP primitive for the framework's homogeneous
deep trunks (Proteus/FrameDiff IPA blocks, SD transformer depth at scale):
a stack of N identical-signature stages is sharded one-stage-per-device
over a ``pp`` mesh axis, microbatches stream through the ring via
``lax.ppermute`` (one ICI hop per tick), and the whole schedule is a
single ``lax.scan`` — so it jit-compiles to one XLA program and is
**reverse-differentiable end-to-end** (the backward pass is the reversed
scan with the transposed permutes; ``train/trainer.py``'s step works
through it unchanged — tests pin gradient equality vs the sequential
stack).

Schedule (classic GPipe fill-drain, SPMD form): at tick ``t`` device 0
ingests microbatch ``t``, every device applies its own stage to whatever
activation it currently holds, device N-1 records its result into output
slot ``t-(N-1)``, and activations rotate one hop forward. ``M``
microbatches complete in ``M + N - 1`` ticks — bubble fraction
``(N-1)/(M+N-1)``; pick ``n_micro >= 4*N`` to keep it under ~20%. Devices
do compute garbage ticks during fill/drain (standard SPMD pipelining);
results are exact because emission is slot-gated.

Constraints: every stage shares one signature ``stage_fn(params_i, x) ->
y`` with ``y.shape == x.shape`` and must be microbatch-elementwise (no
cross-sample coupling such as BatchNorm — true of every trunk in this
framework). No reference counterpart — cite: absent per SURVEY.md §2.5
("Pipeline parallel ... none").
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def pipeline_local(
    stage_params,
    inputs: Array,
    *,
    stage_fn: Callable,
    axis_name: str,
) -> Array:
    """Pipeline body — call INSIDE ``shard_map`` (``axis_name`` bound).

    Args:
      stage_params: per-device shard of the stacked stage parameters —
        every leaf has leading axis 1 (this device's stage).
      inputs: ``(n_micro, mb, ...)`` microbatched activations, replicated
        across the pipeline axis (device 0 is the only consumer; XLA keeps
        the buffer wherever it is needed).
      stage_fn: ``(params_i, x) -> y`` with ``y.shape == x.shape``.
      axis_name: the mesh axis the stage stack is sharded over.

    Returns ``(n_micro, mb, ...)`` outputs, identical on every device.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    n_micro = inputs.shape[0]
    params_i = jax.tree.map(lambda a: a[0], stage_params)

    state0 = jnp.zeros_like(inputs[0])
    out0 = jnp.zeros_like(inputs)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def tick(carry, t):
        state, outputs = carry
        # Stage 0 ingests microbatch t (re-ingests the last one during the
        # drain ticks — those results are never emitted).
        inject = lax.dynamic_index_in_dim(
            inputs, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
        )
        state = jnp.where(idx == 0, inject, state)
        state = stage_fn(params_i, state)
        # Stage N-1 emits into slot t-(N-1); other devices/ticks rewrite
        # the slot's current value (a differentiable no-op).
        slot = jnp.clip(t - (n - 1), 0, n_micro - 1)
        emit = (t >= n - 1) & (idx == n - 1)
        cur = lax.dynamic_index_in_dim(outputs, slot, 0, keepdims=False)
        outputs = lax.dynamic_update_index_in_dim(
            outputs, jnp.where(emit, state, cur), slot, 0
        )
        state = lax.ppermute(state, axis_name, perm)
        return (state, outputs), None

    (_, outputs), _ = lax.scan(
        tick, (state0, out0), jnp.arange(n_micro + n - 1)
    )
    # Only device N-1 ever wrote non-zeros; the psum replicates the result
    # (and transposes cleanly in the backward pass). Cost note: this
    # all-reduces the full (n_micro, mb, ...) buffer over all N stages —
    # O(N x batch) ICI traffic per call — where a single-source broadcast
    # from stage N-1 would do. Kept deliberately: psum is the only
    # collective here whose transpose (the backward pass) XLA handles
    # without a custom rule, and PP comms have never shown in traces
    # (the per-tick ppermute dominates). Revisit if they do.
    return lax.psum(outputs, axis_name)


def pipeline(
    stage_fn: Callable,
    stage_params,
    x: Array,
    mesh: Mesh,
    *,
    axis_name: str = "pp",
    n_micro: Optional[int] = None,
) -> Array:
    """Run ``x`` through the stage stack, pipelined over ``mesh[axis_name]``.

    Args:
      stage_fn: ``(params_i, x) -> y``, ``y.shape == x.shape``, applied
        per stage; must not couple samples within a microbatch.
      stage_params: pytree whose every leaf has leading axis ``n_stages ==
        mesh.shape[axis_name]`` (the stacked per-stage parameters); sharded
        one stage per device.
      x: ``(batch, ...)`` activations.
      n_micro: microbatch count (must divide batch); defaults to
        ``4 * n_stages`` capped at ``batch`` (the largest divisor of batch
        not exceeding it) — bubble <= 20% when batch is
        divisor-friendly. A prime or tiny batch can collapse the default
        to 1 (an (N-1)/N bubble); that degradation is warned about below
        — pass ``n_micro`` explicitly to silence it.

    Returns ``(batch, ...)``, equal to applying the stages sequentially
    within fp32 reassociation tolerance (the pipelined scan and the
    sequential stack sum in different orders; tests/test_pp.py pins
    value and gradient agreement at rtol/atol 1e-5 against an observed
    drift of ~2.4e-6 over 8 matmul stages).
    """
    n = mesh.shape[axis_name]
    sizes = {leaf.shape[0] for leaf in jax.tree.leaves(stage_params)}
    if sizes != {n}:
        raise ValueError(
            f"stage_params leading axes {sizes} != mesh axis "
            f"'{axis_name}' size {n}"
        )
    batch = x.shape[0]
    if n_micro is None:
        n_micro = min(4 * n, batch)
        while batch % n_micro:
            n_micro -= 1
        bubble = (n - 1) / (n_micro + n - 1)
        if bubble > 0.2:
            import warnings

            warnings.warn(
                f"pipeline: default n_micro={n_micro} for batch={batch} over "
                f"{n} stages gives a {bubble:.0%} bubble (> the documented "
                "20% target); pass n_micro explicitly or pad the batch to a "
                f"multiple of {4 * n}",
                stacklevel=2,
            )
    if batch % n_micro:
        raise ValueError(f"batch {batch} not divisible by n_micro {n_micro}")
    xm = x.reshape((n_micro, batch // n_micro) + x.shape[1:])

    fn = shard_map(
        functools.partial(
            pipeline_local, stage_fn=stage_fn, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(stage_params, xm)
    return out.reshape(x.shape)
