"""Child process for the 2-process x 4-device multi-host CPU test.

Launched by ``tests/test_multihost.py``. Each process owns 4 virtual CPU
devices; together they form an 8-device two-"host" slice connected by the
jax.distributed coordinator — the real multi-process code path
(``jax.distributed.initialize``, global meshes, cross-process collectives),
not a simulation on one process.

Prints one JSON line of results for the parent to assert on.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])

    from superdiff_tpu.parallel.distributed import (
        host_shard_info,
        initialize,
        is_coordinator,
    )

    initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    out = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "is_coordinator": is_coordinator(),
    }

    from superdiff_tpu.parallel.mesh import dp_spec, make_multihost_mesh

    mesh = make_multihost_mesh()
    out["mesh_axes"] = dict(zip(mesh.axis_names, mesh.devices.shape))

    # -- cross-process data-parallel reduction (the pmean path) ------------
    # global batch 16 -> 8 rows per process; mean must see ALL rows.
    from jax.sharding import NamedSharding, PartitionSpec as P

    global_batch = np.arange(16, dtype=np.float32).reshape(16, 1)
    local_rows = global_batch[pid * 8 : (pid + 1) * 8]
    sharding = NamedSharding(mesh, dp_spec(mesh, None))
    garr = jax.make_array_from_process_local_data(sharding, local_rows, (16, 1))

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    out["global_mean"] = float(global_mean(garr))  # expect 7.5

    # -- host-sharded Kronecker time sampler -------------------------------
    from superdiff_tpu.core.dsm import kronecker_times

    num_shards, shard_index = host_shard_info()
    out["shard_info"] = [num_shards, shard_index]
    t_local, _ = kronecker_times(
        4, jnp.asarray(0.5), 0.0, 1.0, num_shards=num_shards, shard_index=shard_index
    )
    from jax.experimental import multihost_utils

    t_all = multihost_utils.process_allgather(t_local)
    out["kronecker_all"] = np.asarray(t_all).reshape(-1).tolist()

    # -- mesh training step across hosts (XLA gradient reduction over
    # ICI + DCN — the pmean of cifar/train_utils.py:32 in mesh form) -------
    from superdiff_tpu.core import VPSchedule, make_dsm_loss
    from superdiff_tpu.models import MLPScoreNet
    from superdiff_tpu.train import init_train_state, make_optimizer, make_train_step

    model = MLPScoreNet(hidden=(16,), out_dim=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1)), jnp.zeros((1, 2)))[
        "params"
    ]

    def apply_fn(p, t, x, y, rng=None):
        return model.apply({"params": p}, t, x)

    loss_fn = make_dsm_loss(apply_fn, VPSchedule(), t_0=1e-3)
    opt = make_optimizer(lr=1e-3, warmup=0)
    state = init_train_state(jax.random.PRNGKey(0), params, opt, ema_rate=0.999)
    step = make_train_step(opt, loss_fn, mesh=mesh, donate=False)
    rng = np.random.default_rng(0)  # same data on both processes, split rows
    global_x = rng.normal(size=(16, 2)).astype(np.float32)
    local_x = global_x[pid * 8 : (pid + 1) * 8]
    gx = jax.make_array_from_process_local_data(sharding, local_x, (16, 2))
    state, loss = step(state, {"image": gx})
    out["train_loss"] = float(loss)
    out["step"] = int(state.step)

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
