"""Multi-host initialization and host-aware helpers.

The reference's multi-host awareness is pmap-era (``jax.process_index()``
sharding of the time sampler, rank-0-only logging/checkpointing —
``cifar/dynamics.py:12``, ``run_lib.py:63,92,101``). Here:

* ``initialize()`` wraps ``jax.distributed.initialize`` (idempotent, no-op
  for single-process runs) so the same entry point works on one chip or a
  multi-host slice; the mesh helpers in ``mesh.py`` then see all devices.
* ``is_coordinator()`` gates logging/checkpoint writes.
* ``host_shard_info()`` feeds the Kronecker time sampler's
  (num_shards, shard_index).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX; safe to call in single-process runs."""
    if num_processes is None and coordinator_address is None:
        return  # single-process: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def is_coordinator() -> bool:
    return jax.process_index() == 0


def host_shard_info() -> tuple[int, int]:
    """(num_shards, shard_index) for host-sharded sequences (Kronecker
    sampler parity with ``cifar/dynamics.py:9-13``)."""
    return jax.process_count(), jax.process_index()
