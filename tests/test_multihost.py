"""Real 2-process multi-host test over virtual CPU devices (VERDICT item 8).

Spawns two OS processes, each owning 4 virtual CPU devices, connected via a
``jax.distributed`` coordinator on localhost — exercising
``parallel.distributed.initialize``, the ('dcn', 'data', 'model')
``make_multihost_mesh``, cross-process XLA collectives (the DP gradient
reduction), host-sharded Kronecker time sampling, and the mesh train step —
the actual multi-process code paths, not a single-process simulation.
"""

import json
import math
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def results():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # children force their own platform/device flags; scrub the parent's
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host child timed out")
        assert p.returncode == 0, f"child failed:\n{stderr[-3000:]}"
        line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))
    return outs


def test_process_topology(results):
    by_pid = sorted(results, key=lambda r: r["process_index"])
    assert [r["process_index"] for r in by_pid] == [0, 1]
    for r in by_pid:
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["mesh_axes"] == {"dcn": 2, "data": 4, "model": 1}
    assert by_pid[0]["is_coordinator"] and not by_pid[1]["is_coordinator"]


def test_cross_process_reduction(results):
    # mean over a 16-row batch sharded 8/8 across the two processes: each
    # process only holds half the data, so 7.5 proves the DCN collective ran.
    for r in results:
        np.testing.assert_allclose(r["global_mean"], 7.5, rtol=1e-6)


def test_kronecker_host_sharding(results):
    # the two processes' slices tile the single global low-discrepancy
    # sequence exactly (cifar/dynamics.py:9-13 semantics across hosts)
    expect = (0.5 + math.sqrt(2.0) * np.arange(8)) % 1.0
    for r in results:
        got = np.asarray(r["kronecker_all"]).reshape(2, 4)
        np.testing.assert_allclose(got[0], expect[:4], rtol=1e-5)
        np.testing.assert_allclose(got[1], expect[4:], rtol=1e-5)


def test_mesh_train_step_agrees_across_hosts(results):
    # gradient reduction spans both hosts: every process sees the same
    # global loss and post-step state counter
    losses = [r["train_loss"] for r in results]
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    assert all(r["step"] == 2 for r in results)
