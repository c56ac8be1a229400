"""Orbax checkpointing with preemption-safe restore.

Parity with ``cifar/run_lib.py:43-52``: a ``CheckpointManager`` with
``max_to_keep=50``, latest-step auto-restore on startup so preempted training
resumes from the last save (the reference's only elastic-recovery mechanism,
SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .state import TrainState


def make_manager(workdir: str, max_to_keep: int = 50) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.join(workdir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, step_prefix="chkpt", create=True
    )
    return ocp.CheckpointManager(path, options=options)


def save(mgr: ocp.CheckpointManager, step: int, state: TrainState) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def restore_latest(
    mgr: ocp.CheckpointManager, template: TrainState
) -> Optional[TrainState]:
    """Restore the latest checkpoint into the template's pytree structure.

    Returns None when no checkpoint exists (fresh run).
    """
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(template))
