"""Persistent XLA compilation cache.

First-compile latency on TPU is the framework's dominant cold-start cost
(the 200-step CIFAR joint sampler: ~350s; the SD 50-step program: ~150s).
The JAX persistent cache eliminates it across processes — verified working
through the remote-compile tunnel in this environment. Enabled by every CLI
entry point; set ``SUPERDIFF_NO_CACHE=1`` to disable or
``SUPERDIFF_CACHE_DIR`` to relocate.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SUPERDIFF_NO_CACHE"):
        return None
    import jax

    path = path or os.environ.get(
        "SUPERDIFF_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "superdiff_tpu_xla"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        return None
    return path
