"""Full CIFAR-style SuperDiff workflow on one chip: train A, train B, compose.

The reference's headline experiment (SURVEY.md §3.2): two score models
trained on disjoint class splits (``train<5`` / ``train>5``), then joint
OR-composition along one reverse trajectory. Without the real CIFAR-10 data
in this environment, the synthetic stand-in dataset keeps the class
structure (class k has base intensity ~k*25), so composition quality is
checkable: joint samples must cover BOTH models' intensity families, and the
per-sample running log-likelihoods must commit to one model.

  python examples/cifar_workflow.py [--iters 1500] [--workdir /tmp/cifar_wf]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from superdiff_tpu.utils.tunnel import require_tunnel

    require_tunnel('cifar_workflow example')
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/cifar_wf")
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--sample_batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    from superdiff_tpu.pipelines import cifar as C
    from superdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    def small(split):
        return C.CifarConfig(
            nf=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
            train_split=split, batch_size=128, log_every=100,
            save_every=args.iters, lr=1e-3, warmup=100, ema_rate=0.999,
            eval_batch_size=args.sample_batch, n_sample_steps=200,
        )

    print(f"[1/3] training model A on 'train<5' ({args.iters} iters)", flush=True)
    cfg_a = small("train<5")
    state_a = C.train(cfg_a, os.path.join(args.workdir, "a"), n_iters=args.iters)
    print(f"[2/3] training model B on 'train>5'", flush=True)
    cfg_b = small("train>5")
    state_b = C.train(cfg_b, os.path.join(args.workdir, "b"), n_iters=args.iters)

    print("[3/3] joint OR composition across the two checkpoints", flush=True)
    model = cfg_a.model()
    gen, n_steps = C.make_generator(
        model, [state_a.params_ema, state_b.params_ema], cfg_a,
        mode="sde", operator="or",
    )
    x0, logq = gen(jax.random.PRNGKey(7))
    x0, logq = np.asarray(x0), np.asarray(logq)

    # class-family check: A saw dark classes (0-4), B bright (5-9)
    intensity = (x0.mean(axis=(1, 2, 3)) + 1.0) / 2.0 * 255.0  # back to [0,255]
    frac_bright = float((intensity > 112).mean())
    w = np.exp(logq) / np.exp(logq).sum(-1, keepdims=True)
    committed = float((w.max(-1) > 0.99).mean())
    frac_model_a = float((logq[:, 0] > logq[:, 1]).mean())
    report = {
        "n_samples": len(x0),
        "sampler_steps": n_steps,
        "intensity_mean": float(intensity.mean()),
        "intensity_p10_p90": [float(np.percentile(intensity, 10)), float(np.percentile(intensity, 90))],
        "frac_bright_family": frac_bright,
        "frac_won_by_model_a": frac_model_a,
        "frac_or_committed": committed,
    }
    print(json.dumps(report, indent=2), flush=True)
    np.savez_compressed(os.path.join(args.workdir, "joint_samples.npz"), samples=x0, logq=logq)
    ok = 0.1 < frac_bright < 0.9 and committed > 0.95
    print("WORKFLOW", "OK" if ok else "SUSPECT", flush=True)
    return report


if __name__ == "__main__":
    main()
