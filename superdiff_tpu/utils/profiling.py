"""Profiling: jax.profiler traces + per-phase wall timing.

The reference's observability is wall-clock prints and NFE counts
(SURVEY.md §5.1); here every hot path is a single compiled program, so one
trace captures the full step. Usage:

    with trace("/tmp/tb"):            # open in TensorBoard / xprof
        run(...)

    with phase_timer("sample") as t:  # device-synced wall timing
        out = run(...)
        t.sync(out)
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """jax.profiler trace context; writes a TensorBoard-compatible trace."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _PhaseTimer:
    def __init__(self, name: str, sink=None):
        self.name = name
        self.sink = sink
        self.t0 = time.perf_counter()
        self.elapsed: Optional[float] = None

    def sync(self, result):
        """Block on a result; on tunneled runtimes prefer a host transfer
        (e.g. float(x.sum())) — block_until_ready may under-wait there."""
        jax.block_until_ready(result)
        return result


@contextlib.contextmanager
def phase_timer(name: str, sink=None):
    t = _PhaseTimer(name, sink)
    try:
        yield t
    finally:
        t.elapsed = time.perf_counter() - t.t0
        msg = {"phase": name, "seconds": t.elapsed}
        if sink is not None:
            sink.log(**msg)
        else:
            print(f"[profile] {name}: {t.elapsed:.3f}s", flush=True)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
