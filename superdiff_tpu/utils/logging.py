"""Observability: local JSONL metric sink with optional wandb passthrough.

The reference logs everything to wandb (``run_lib.py:102``,
``clip_eval.py:415``, ``composition.py:613-632``); this environment has no
network, so the universal sink is an append-only JSONL file next to the run —
the same per-step kappa / per-model ll traces remain inspectable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False, **wandb_kw):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**wandb_kw)
            except Exception:
                self._wandb = None

    def log(self, step: Optional[int] = None, **metrics) -> None:
        rec = {"ts": time.time(), **({"step": step} if step is not None else {}), **metrics}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)


class Timer:
    """Phase timer with device sync (jax.block_until_ready on the result)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self, result=None) -> float:
        if result is not None:
            import jax

            jax.block_until_ready(result)
        return time.perf_counter() - self.t0
