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

Multi-host: ``parallel.distributed.initialize()`` (wired into the CLI) sets
up the process group; ``make_multihost_mesh`` then builds a
('dcn', 'data', 'model') mesh whose leading axis spans processes — data
parallelism shards over ('dcn', 'data') jointly, so gradient reductions ride
ICI within a host and cross DCN once per host (the scaling-book layout).
``dp_spec(mesh)`` picks the right batch PartitionSpec for either mesh shape.
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


def make_multihost_mesh(
    model: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """('dcn', 'data', 'model') mesh for multi-process runs.

    ``jax.devices()`` orders devices process-major, so reshaping to
    (process_count, local_data, model) puts each host's chips contiguous on
    the 'data' axis: DP collectives reduce over ICI first, then once over
    DCN per host. Falls back to dcn=1 in single-process runs (same program
    works on one chip or a multi-host slice)."""
    devices = list(devices if devices is not None else jax.devices())
    n_proc = jax.process_count()
    n = len(devices)
    assert n % (n_proc * model) == 0, (
        f"{n} devices not divisible by processes={n_proc} x model={model}"
    )
    arr = np.asarray(devices).reshape(n_proc, n // (n_proc * model), model)
    return Mesh(arr, axis_names=("dcn", "data", "model"))


def dp_spec(mesh: Mesh, *trailing) -> P:
    """Batch-dim PartitionSpec for this mesh: ('dcn', 'data') jointly when a
    DCN axis exists, else 'data'. ``trailing`` extends the spec for extra
    dims."""
    if "dcn" in mesh.axis_names:
        return P(("dcn", "data"), *trailing)
    return P("data", *trailing)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for host-fed arrays: (B, ...) split over the data
    axes (incl. DCN on multi-host meshes)."""
    return NamedSharding(mesh, dp_spec(mesh))


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
