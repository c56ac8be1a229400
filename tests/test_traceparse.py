"""Unit tests for the shared perfetto parser (utils/traceparse.py).

The parser drives both measurement scripts (trace_unet / trace_protein);
its category taxonomy is the schema of every `categories_ms_per_iter`
entry in BENCH_DETAIL.json, so bucketing rules are pinned here.
"""

import gzip
import json
import os

from superdiff_tpu.utils import traceparse


def test_category_taxonomy():
    cases = {
        "jit_scanned(123)": "outer-wrappers(excluded)",
        "while.8": "outer-wrappers(excluded)",
        "attn1.88": "attention-kernels",
        "custom-call.17": "attention-kernels",
        "block_ffn.3": "geglu-ffn-kernels",
        "fusion.2711": "fusion(conv/matmul/elem)",
        "loop_fusion.5": "fusion(conv/matmul/elem)",
        "convert_reduce_fusion.2": "reduce/norm",
        "convert.9": "other",
        "convolution_add_fusion.69": "convolution",
        "dot.4": "matmul",
        "copy.1": "data-formatting",
        "bitcast_transpose.2": "data-formatting",
        "dynamic-slice.3": "slice/concat/pad",
        "concatenate.1": "slice/concat/pad",
        "sort.2": "sort/top-k",
        "reduce.11": "reduce/norm",
        "rng-bit-generator.0": "other",
    }
    for name, want in cases.items():
        assert traceparse.category(name) == want, (name, want)


def _write_trace(tmpdir, events):
    path = os.path.join(tmpdir, "plugins", "run")
    os.makedirs(path, exist_ok=True)
    with gzip.open(os.path.join(path, "x.trace.json.gz"), "wt") as fh:
        json.dump({"traceEvents": events}, fh)


def test_load_and_categorize(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        # device events: two fusions + one attention + an outer wrapper
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 1000},
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 500},
        {"ph": "X", "pid": 1, "name": "attn1.7", "dur": 2000},
        {"ph": "X", "pid": 1, "name": "jit_main(1)", "dur": 9999},
        # host event must be excluded
        {"ph": "X", "pid": 2, "name": "fusion.1", "dur": 777777},
        # non-complete event must be excluded
        {"ph": "B", "pid": 1, "name": "fusion.1", "dur": 123},
    ]
    _write_trace(str(tmp_path), events)
    per_op = traceparse.load_device_ops(str(tmp_path))
    assert per_op["fusion.1"] == 1500  # summed, host copy excluded
    assert per_op["attn1.7"] == 2000
    cats, total = traceparse.categorize(per_op)
    assert cats["fusion(conv/matmul/elem)"] == 1500
    assert cats["attention-kernels"] == 2000
    assert total == 3500  # jit_main excluded from the total

    entry = traceparse.report(per_op, iters=10)
    assert entry["total_device_ms_per_iter"] == 0.35
    assert entry["categories_ms_per_iter"] == {
        "fusion(conv/matmul/elem)": 0.15,
        "attention-kernels": 0.2,
    }
