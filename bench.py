"""Headline benchmark: 2-model SuperDiff Stable-Diffusion throughput.

Measures images/sec/chip for the OR-composition of two prompt conditionings
of an SD-1.x UNet at 512 px, 50 inference steps (BASELINE.json north-star:
>= 10 images/sec/chip on v5e). The UNet is the full SD-1.x architecture
(860M params); weights are random when no local safetensors are present —
identical compute graph, identical throughput.

Per step the composed sampler needs 3 conditional UNet evaluations
(obj / bg / uncond, ``applications/images/clip_eval.py:354,394,418``); this
implementation fuses them into one batch-3B forward inside a single
``lax.scan`` program, bf16 on the MXU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

BASELINE_IMG_PER_SEC = 10.0  # driver-supplied target (BASELINE.md)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _tunnel_alive() -> bool:
    """The axon TPU plugin reaches the chip via the endpoint(s) in
    PALLAS_AXON_POOL_IPS (a local relay in this image); when the endpoint is
    unreachable the plugin hangs forever instead of erroring. Probe it so a
    dead tunnel produces a JSON line instead of a silent hang (the shared
    probe assumes alive when no relay is configured — never skip a bench
    that could have run)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from superdiff_tpu.utils.tunnel import tunnel_alive

    return tunnel_alive()


def _acquire_tpu_lock(path="/tmp/tpu_lock", max_wait_s=2700, stale_s=2700):
    """Cooperative one-TPU-process lock. Two processes attaching through the
    tunnel deadlock each other (CLAUDE.md), so the measurement queue and this
    bench serialize via an atomic mkdir lock. Waits up to ``max_wait_s``;
    steals locks older than ``stale_s`` (a wedged holder); then proceeds
    regardless (never silently skips the bench)."""
    import os
    import shutil
    import time as _t

    deadline = _t.time() + max_wait_s
    while _t.time() < deadline:
        try:
            os.mkdir(path)
            return path
        except FileExistsError:
            try:
                age = _t.time() - os.stat(path).st_mtime
            except OSError:
                continue  # holder just released
            if age > stale_s:
                _log(f"stealing stale tpu lock (age {age:.0f}s)")
                shutil.rmtree(path, ignore_errors=True)
                continue
            _log(f"waiting for tpu lock (held {age:.0f}s)")
            _t.sleep(15)
    _log("tpu lock wait timed out — proceeding anyway")
    return None


def main():
    # Always probe when the pool endpoint is configured: JAX_PLATFORMS=cpu as
    # an env var is IGNORED by the pinned axon plugin (CLAUDE.md) — such a run
    # still attaches to the chip, so skipping the probe on the env var would
    # reintroduce the silent-hang failure the probe exists to prevent. This
    # script never forces CPU in-process, so the probe is unconditional.
    if not _tunnel_alive():
        _log("TPU tunnel relay is not listening — cannot reach the chip")
        print(json.dumps({
            "metric": "superdiff_sd_or_2model_512px_50step_throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": "tpu_tunnel_down",
        }))
        return

    import atexit
    import os
    import shutil

    # parent holding the lock already (the serialized measurement queue)
    if os.environ.get("TPU_LOCK_HELD") != "1":
        lock = _acquire_tpu_lock()
        if lock:
            atexit.register(lambda: shutil.rmtree(lock, ignore_errors=True))

    import jax
    import jax.numpy as jnp

    import superdiff_tpu  # noqa: F401
    from superdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from superdiff_tpu.pipelines import sd as sdp
    from superdiff_tpu.models.sd.clip import CLIPTextConfig

    batch_size = 8  # forward batch 24; best measured throughput on v5e
    steps = 50
    # Optional lever overrides (SUPERDIFF_BENCH_LEVERS, comma list of
    # flash_nat / flash_eo / subpixel / no_dedup) so the measurement queue
    # can time the headline with the opt-in kernels without a source edit.
    import dataclasses
    import os as _os

    from superdiff_tpu.models.sd.unet import SDUNetConfig

    levers = sorted(
        s for s in _os.environ.get("SUPERDIFF_BENCH_LEVERS", "").split(",") if s
    )
    # Defaults are the measured winners (flash_eod + subpixel + dedup +
    # pvtd2 d-major long-attention kernel at block_q 4096 + short-kv
    # einsum); levers A/B *away* from them.
    known = {
        "flash", "flash_nat", "flash_eo", "flash_eod", "subpixel", "repeat",
        "no_dedup",
        "long_1block", "long_mxsum", "long_pipe2", "long_pipe4",
        "long_pvt1", "long_pvt2",
        "eod_pvtd1", "eod_pvtd2",
        "cross_nat", "cross_xpk", "cross_einsum",
        "batch4", "batch12", "batch16",
        "bq512", "bq1024", "bq2048", "bq4096",
        "eodbq1024", "eodbq2048", "eodbq4096",
    }
    unknown = [s for s in levers if s not in known]
    if unknown:
        # a typo'd lever must not run the default config under a lever label
        raise SystemExit(
            f"unknown SUPERDIFF_BENCH_LEVERS {unknown}; known: {sorted(known)}"
        )
    ucfg = SDUNetConfig()
    if "flash" in levers:
        ucfg = dataclasses.replace(ucfg, attn_impl="flash")
    if "flash_nat" in levers:
        ucfg = dataclasses.replace(ucfg, attn_impl="flash_nat")
    if "flash_eo" in levers:
        ucfg = dataclasses.replace(ucfg, attn_impl="flash_eo")
    if "flash_eod" in levers:
        ucfg = dataclasses.replace(ucfg, attn_impl="flash_eod")
    if "repeat" in levers:
        ucfg = dataclasses.replace(ucfg, upsample_impl="repeat")
    if "subpixel" in levers:
        ucfg = dataclasses.replace(ucfg, upsample_impl="subpixel")
    for lv in levers:
        if lv.startswith("long_"):
            from superdiff_tpu.ops.pallas import flash_attention as _fa

            _fa._LONG_IMPL = lv[len("long_"):]
        elif lv.startswith("eod_"):
            from superdiff_tpu.ops.pallas import flash_attention as _fa

            _fa._EOD_IMPL = lv[len("eod_"):]
        elif lv.startswith("cross_"):
            # short-kv (cross-attention) routing: einsum default,
            # nat/xpk Pallas levers (attn_cross_routing_sweep)
            from superdiff_tpu.ops.pallas import flash_attention as _fa

            _fa._CROSS_IMPL = lv[len("cross_"):]
        elif lv.startswith("eodbq"):
            # d-major long-attention q block (attn_long_eod_sweep)
            from superdiff_tpu.ops.pallas import flash_attention as _fa

            _fa._EOD_BLOCK_Q = int(lv[len("eodbq"):])
        elif lv.startswith("bq"):
            # long-attention q-block rows per program (the
            # attn_long_blockq_sweep lever, pvt1 best at 2048)
            from superdiff_tpu.ops.pallas import flash_attention as _fa

            _fa._LONG_BLOCK_Q = int(lv[len("bq"):])
        elif lv.startswith("batch"):
            # latent batch sweep (forward batch = 3x with dedup): batch 8
            # was tuned before flash_eo/pipe2/subpixel shifted the cost
            # ratios; the throughput optimum may have moved.
            batch_size = int(lv[len("batch"):])
    cfg = sdp.SDPipelineConfig(
        num_inference_steps=steps, height=512, width=512,
        cond_dedup="no_dedup" not in levers,
    )
    if levers:
        _log(f"lever overrides: {levers}")

    key = jax.random.PRNGKey(0)
    mod = sdp.build_sd_modules(
        key, unet_config=ucfg, height=cfg.height, width=cfg.width
    )
    # bf16 weights: inference-only ensemble composition; halves HBM traffic
    # for the weight streams, the bandwidth bottleneck of UNet inference.
    mod.unet_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        mod.unet_params,
    )

    tcfg = CLIPTextConfig()
    ctx_shape = (batch_size, tcfg.max_length, 768)
    k1, k2, k3, krun = jax.random.split(key, 4)
    ctx_obj = jax.random.normal(k1, ctx_shape)
    ctx_bg = jax.random.normal(k2, ctx_shape)
    ctx_unc = jax.random.normal(k3, ctx_shape)

    run = sdp.make_sampler(mod, "or", cfg)

    def run_synced(key):
        lat, _ = run(key, ctx_obj, ctx_bg, ctx_unc)
        # A host transfer is the only reliable completion barrier on remote
        # (tunneled) TPU runtimes; block_until_ready can return early there.
        return float(lat.sum())

    # warmup: compile + one full executed trajectory
    t0 = time.perf_counter()
    run_synced(krun)
    _log(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    run_synced(jax.random.fold_in(krun, 999))
    _log(f"second warmup run: {time.perf_counter() - t0:.1f}s")

    n_rep = 2
    t0 = time.perf_counter()
    for i in range(n_rep):
        run_synced(jax.random.fold_in(krun, i))
    dt = (time.perf_counter() - t0) / n_rep

    imgs_per_sec = batch_size / dt
    print(
        json.dumps(
            {
                "metric": "superdiff_sd_or_2model_512px_50step_throughput",
                "value": round(imgs_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMG_PER_SEC, 4),
            }
        )
    )
    # keep every headline measurement in the committed artifact too
    try:
        from superdiff_tpu.utils.bench_io import merge_bench_detail

        tag = "+".join(levers) if levers else "default"
        merge_bench_detail({f"sd_headline_{tag}": {
            "images_per_sec_chip": round(imgs_per_sec, 4),
            "levers": levers,
            "batch": batch_size,
            "steps": steps,
        }})
    except Exception as e:  # never fail the bench over artifact IO
        _log(f"BENCH_DETAIL merge skipped: {e}")


if __name__ == "__main__":
    main()
