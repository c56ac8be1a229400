"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's pmap-era data parallelism
(``cifar/run_lib.py:75``, ``cifar/train_utils.py:32,47``) and the vendored
torch DDP/NCCL training (``train_se3_diffusion.py:83-91``): one
``jax.sharding.Mesh`` with named axes, ``jit`` + ``NamedSharding``, and XLA
ICI collectives inserted by the compiler.

Axes:
  * ``data``  — batch sharding (DP); gradients are reduced by XLA psum.
  * ``model`` — (a) the stacked-ensemble axis for SuperDiff's N denoisers
    (model-ensemble parallelism, SURVEY.md §2.5), and/or (b) intra-model
    tensor sharding for large nets (SD UNet).

Multi-host: `jax.distributed.initialize` is the caller's responsibility; all
helpers here operate on ``jax.devices()`` and are host-count agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``data=None`` uses all devices not consumed by ``model``. On a physical
    slice, ``mesh_utils``-style contiguity is preserved by keeping the model
    axis innermost (minor) so each denoiser's replicas sit on neighboring
    chips and ensemble mixing collectives ride single-hop ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for host-fed arrays: (B, ...) split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked-parameter sharding: leading model axis over 'model'.

    Used with ``models.ensemble.stack_params`` — each of the N denoisers'
    weights live on their own chip group; the per-step mixing reduction is a
    psum over the 'model' axis of per-model scores only (latent-sized, tiny
    compared to weight gathers).
    """
    return NamedSharding(mesh, P("model"))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, batch dim over 'data'."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """Mesh over however many devices exist (virtual CPU devices in tests)."""
    devs = jax.devices()[:n]
    return make_mesh(data=len(devs), model=1, devices=devs)
