"""Perfetto trace parsing shared by the trace scripts.

``scripts/trace_unet.py`` established the protocol: capture one profiled
execution of a K-iteration scan, read the ``*.trace.json.gz`` perfetto
artifact, keep device-track complete events, and bucket op names into
performance categories. This module is that parser, factored out so the
protein trace (``scripts/trace_protein.py``) reports through the identical
category taxonomy (VERDICT r4 #7: the protein path gets the SD path's
measurement discipline).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, Tuple


def load_device_ops(logdir: str) -> collections.Counter:
    """Sum device-track complete-event durations (us) per op name."""
    traces = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert traces, f"no perfetto trace under {logdir}"
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)

    pid_names = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "device" in n.lower()
    }

    per_op = collections.Counter()
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        per_op[ev.get("name", "")] += ev.get("dur", 0)
    return per_op


def category(name: str) -> str:
    """The category taxonomy from trace_unet.py (kept identical)."""
    n = name.lower()
    if n.startswith(("jit_", "while")):
        return "outer-wrappers(excluded)"
    if "flash" in n or "custom-call" in n or "attn" in n:
        return "attention-kernels"
    if n.startswith("block_"):
        return "geglu-ffn-kernels"
    if n.startswith(
        ("fusion", "loop_fusion", "input_fusion", "output_fusion")
    ) or ".fusion" in n:
        return "fusion(conv/matmul/elem)"
    if "convert" in n:
        return "reduce/norm" if "reduce" in n else "other"
    if "convolution" in n or "conv" in n:
        return "convolution"
    if "dot" in n or "einsum" in n or "matmul" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "data-formatting"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n:
        return "slice/concat/pad"
    if "sort" in n or "top-k" in n or "topk" in n:
        return "sort/top-k"
    if "reduce" in n or "norm" in n:
        return "reduce/norm"
    return "other"


def categorize(
    per_op: collections.Counter,
) -> Tuple[collections.Counter, int]:
    """(category -> us, total us excluding outer wrappers)."""
    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[category(name)] += dur
    total = sum(
        d for n, d in per_op.items()
        if category(n) != "outer-wrappers(excluded)"
    )
    return cats, total


def report(per_op: collections.Counter, iters: int, top: int = 40) -> Dict:
    """Print the standard category/top-op report; return the category dict
    (ms/iter) for BENCH_DETAIL."""
    cats, total = categorize(per_op)
    print(f"\ntotal device time: {total/1e3/iters:.1f} ms/iter over {iters} iters")
    print("\n== categories (ms/iter) ==")
    for c, d in cats.most_common():
        print(f"  {c:28s} {d/1e3/iters:8.2f}")
    print(f"\n== top {top} ops (ms/iter) ==")
    for name, dur in per_op.most_common(top):
        print(f"  {dur/1e3/iters:8.3f}  {name[:110]}")
    return {
        "total_device_ms_per_iter": round(total / 1e3 / iters, 2),
        "categories_ms_per_iter": {
            c: round(d / 1e3 / iters, 2)
            for c, d in cats.most_common()
            if c != "outer-wrappers(excluded)"
        },
    }
