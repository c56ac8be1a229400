"""Shared BENCH_DETAIL.json persistence for the measurement scripts.

Every on-chip measurement script (bench_all, trace_unet, the kernel
sweeps) merges its keyed entries into one committed artifact, so the
measurement queue regenerates BENCH_DETAIL directly — numbers never live
only in /tmp logs (the round-3 artifact-drift failure mode).
"""

from __future__ import annotations

import json
import os
from typing import Dict

DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "..", "..",
                            "BENCH_DETAIL.json")


def merge_bench_detail(entries: Dict[str, dict], path: str = DEFAULT_PATH) -> str:
    """Merge ``entries`` into the artifact, keeping keys owned by other
    scripts (merge-don't-overwrite). Returns the path written.

    The write is atomic (temp file + os.replace): a SIGTERM from a queue
    step's ``timeout`` mid-dump must not leave a truncated artifact that the
    next merge would silently reset to ``{}``."""
    merged: Dict[str, dict] = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                merged = json.load(fh)
        except Exception:
            merged = {}
    merged.update(entries)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(merged, fh, indent=2)
    os.replace(tmp, path)
    return os.path.abspath(path)
