"""Trained-model quality table on one chip (the evals.ipynb protocol).

Reproduces the reference's CIFAR evaluation matrix (``notebooks/evals.ipynb``
cells 5/8/10: single-model FID, joint-composition FID, per-split models,
pool-mixed baseline, sanity bounds) end-to-end on the attached TPU, with the
two environment stand-ins this image forces — both documented in the output:

* data: the synthetic class-structured CIFAR stand-in from
  ``data/datasets.py`` (real CIFAR-10 binaries absent, no egress);
* features: the JAX InceptionV3 port (``models/inception.py``) with a FIXED
  seeded random init ("random-feature FID" — a valid two-sample discrepancy;
  the identical code path runs the released imagenet weights when supplied).

The numbers are therefore NOT comparable to BASELINE.md's values, but the
*orderings* the reference table exhibits must reproduce: train-subset FID
~0, noise FID enormous, trained models far below untrained, joint
composition between/below the single models, FID falling with training.

  python scripts/quality_report.py [--iters 3000] [--n_samples 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(m):
    print(f"[quality] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quality_report")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--n_samples", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="QUALITY.json")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="cpu = plumbing smoke-run without the chip")
    ap.add_argument("--sample_steps", type=int, default=200,
                    help="sampler steps per row (reduce for smoke runs)")
    ap.add_argument("--bpd_batch", type=int, default=64)
    ap.add_argument("--bpd_steps", type=int, default=100)
    ap.add_argument("--rows_from", default=None,
                    help="re-derive orderings from a finished QUALITY.json "
                         "(no chip, no sampling; rows/FLD/BPD kept verbatim)")
    args = ap.parse_args()

    if args.rows_from:
        from superdiff_tpu.eval.ordering import build_orderings, check, _ci

        with open(args.rows_from) as f:
            old = json.load(f)
        rows = old["rows"]
        orderings = build_orderings(rows)
        fld_gen = [n for n in rows if "fld_ci95" in rows[n]]
        if fld_gen and "fld" in rows.get("sanity_noise", {}):
            orderings.append(check(
                "fld: every generated row << sanity_noise",
                max(_ci(rows, n, "fld")[1] for n in fld_gen),
                _ci(rows, "sanity_noise", "fld")[0],
            ))
        old["orderings_checked"] = orderings
        with open(args.out, "w") as f:
            json.dump(old, f, indent=1)
        print(json.dumps(old, indent=1))
        return

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from superdiff_tpu.utils.tunnel import require_tunnel

        require_tunnel('quality_report')

    import jax
    import jax.numpy as jnp

    from superdiff_tpu.data.datasets import ImageDataset, get_image_inverse_scaler
    from superdiff_tpu.eval import fid as fid_lib
    from superdiff_tpu.eval import fld as fld_lib
    from superdiff_tpu.eval.bpd import make_bpd_estimator
    from superdiff_tpu.core import VPSchedule
    from superdiff_tpu.models import inception
    from superdiff_tpu.pipelines import cifar as C
    from superdiff_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.workdir, exist_ok=True)

    # -- fixed-seed random-feature InceptionV3 (documented stand-in) --------
    # include_top=True: the same net serves pool3 features (FID/FLD) AND the
    # class-logits head (IS — evals.ipynb cells 5/13/15 carry an IS column)
    log("initializing feature net (jitted — eager init is ~400 tunneled dispatches)")
    feat_params = jax.jit(
        lambda k: inception.init_params(k, include_top=True)
    )(jax.random.PRNGKey(1234))
    _extract = inception.make_feature_fn(
        feat_params, batch_size=256, with_logits=True
    )

    def feature_fn(imgs):
        return _extract(imgs)[0]

    def features_and_logits(imgs):
        return _extract(imgs)

    inception.save_npz(feat_params, os.path.join(args.workdir, "feature_net.npz"))

    # -- dataset features ---------------------------------------------------
    def split_features(split, n, with_logits=False):
        ds = ImageDataset("CIFAR10", split, seed=0)
        feats, logits, seen = [], [], 0
        for b in ds.batches(args.batch, uniform_dequantization=False,
                            random_flip=False, scale_to_pm1=False, loop=False):
            imgs = (b["image"] * 255).astype(np.uint8)
            f, l = features_and_logits(imgs)
            feats.append(f)
            logits.append(l)
            seen += len(imgs)
            if seen >= n:
                break
        if with_logits:
            return np.concatenate(feats)[:n], np.concatenate(logits)[:n]
        return np.concatenate(feats)[:n]

    N_REF = max(args.n_samples, 2048)
    log("extracting dataset features")
    train_feats, train_logits = split_features("train", N_REF, with_logits=True)
    test_feats = split_features("test", N_REF)

    # -- train the model pair (reference UNet config, class-split data) -----
    def cfg_for(split):
        return C.CifarConfig(
            train_split=split, batch_size=128, log_every=500,
            save_every=args.iters, ema_rate=0.999,
            eval_batch_size=args.batch, n_sample_steps=args.sample_steps,
        )

    states, cfgs = {}, {}
    for name, split in (("A", "train<5"), ("B", "train>5")):
        t0 = time.time()
        cfgs[name] = cfg_for(split)
        log(f"training model {name} on '{split}' ({args.iters} iters)")
        states[name] = C.train(
            cfgs[name], os.path.join(args.workdir, name.lower()), n_iters=args.iters
        )
        log(f"model {name} trained in {time.time() - t0:.0f}s")

    model = cfgs["A"].model()
    inverse = get_image_inverse_scaler()

    def gen_features(params_list, mode, operator):
        # vmap ensemble: the unrolled 2x full-size UNet sampler exceeds the
        # tunneled remote-compile request size limit (HTTP 413)
        gen, _ = C.make_generator(
            model, params_list, cfgs["A"], mode=mode, operator=operator,
            score_mode="vmap" if len(params_list) > 1 else "unroll",
        )
        feats, logits, key = [], [], jax.random.PRNGKey(7)
        for i in range(-(-args.n_samples // args.batch)):
            key, k = jax.random.split(key)
            x0, _ = gen(k)
            imgs = np.asarray(jnp.clip(inverse(x0) * 255.0, 0, 255).astype(jnp.uint8))
            f, l = features_and_logits(imgs)
            feats.append(f)
            logits.append(l)
        return (np.concatenate(feats)[: args.n_samples],
                np.concatenate(logits)[: args.n_samples])

    pa, pb = states["A"].params_ema, states["B"].params_ema
    # CIFAR-tier operators are OR and averaged, as in the reference's CIFAR
    # stack (dynamics.py joint fields; AND lives in the SD/protein tiers).
    # Single-model ODE rows complete the evals.ipynb cell-5/10 matrix
    # (VERDICT r4 #1/#3): without them the joint-ODE number has no intra-
    # protocol baseline and the r4 anomaly (81.7 vs SDE singles ~50) could
    # not be attributed to the mixing path vs ODE sampling per se.
    runs = {
        "model_A_sde": ([pa], "sde", "avg"),
        "model_B_sde": ([pb], "sde", "avg"),
        "model_A_ode": ([pa], "ode", "avg"),
        "model_B_ode": ([pb], "ode", "avg"),
        "joint_or_sde": ([pa, pb], "sde", "or"),
        "joint_or_ode": ([pa, pb], "ode", "or"),
        "joint_avg_sde": ([pa, pb], "sde", "avg"),
    }
    def fid_row(ref, f):
        # bootstrap CI over the generated pool (VERDICT r3 weak #6: FID at
        # n=1024 has several points of noise; orderings need margins)
        b = fid_lib.fid_bootstrap(ref, f, n_boot=16, seed=0)
        return {
            "value": round(b["value"], 3),
            "ci95": [round(b["ci95"][0], 3), round(b["ci95"][1], 3)],
            "boot_std": round(b["boot_std"], 3),
        }

    def is_row(logits):
        m, s = fid_lib.inception_score(logits, splits=10)
        return round(m, 3), round(s, 3)

    rows = {}
    gen_feat_cache = {}
    for name, (params, mode, op) in runs.items():
        t0 = time.time()
        log(f"sampling {name}")
        f, l = gen_features(params, mode, op)
        gen_feat_cache[name] = f
        ftr = fid_row(train_feats, f)
        ism, iss = is_row(l)
        rows[name] = {
            "fid_train": ftr["value"],
            "fid_train_ci95": ftr["ci95"],
            "fid_train_boot_std": ftr["boot_std"],
            "fid_test": round(fid_lib.fid_from_features(test_feats, f), 3),
            "is_mean": ism,
            "is_std": iss,
            "seconds": round(time.time() - t0, 1),
        }
        log(f"{name}: {rows[name]}")

    # pool-mixed baseline (evals.ipynb cell 11): mix A and B sample pools.
    # Shuffle once (fixed seed) so every PREFIX of the pool is a true A/B
    # mix: the FLD rows below score gen_feat_cache[name][:512], and an
    # unshuffled concat's first half is exactly model A's pool — the r4
    # on-chip run scored model A twice under two names this way (FID is
    # slice-free and was unaffected).
    mixed = np.concatenate(
        [gen_feat_cache["model_A_sde"][: args.n_samples // 2],
         gen_feat_cache["model_B_sde"][: args.n_samples // 2]]
    )
    mixed = mixed[np.random.default_rng(11).permutation(len(mixed))]
    fm = fid_row(train_feats, mixed)
    rows["pool_mixed_baseline"] = {
        "fid_train": fm["value"],
        "fid_train_ci95": fm["ci95"],
        "fid_train_boot_std": fm["boot_std"],
        "fid_test": round(fid_lib.fid_from_features(test_feats, mixed), 3),
    }

    # sanity bounds (evals.ipynb cell 15 analog: train data and uniform
    # noise bracket every generated row, in FID AND IS — the reference's
    # bounds are IS 10.851 train / 3.375 noise)
    rng = np.random.default_rng(0)
    noise_imgs = rng.integers(0, 256, (args.n_samples, 32, 32, 3), dtype=np.uint8)
    noise_feats, noise_logits = features_and_logits(noise_imgs)
    noise_feats, noise_logits = noise_feats[: args.n_samples], noise_logits[: args.n_samples]
    sub_feats, sub_logits = split_features(
        "train[:20%]", args.n_samples, with_logits=True
    )
    for name, feats, logits in (
        ("sanity_train_subset", sub_feats, sub_logits),
        ("sanity_noise", noise_feats, noise_logits),
    ):
        fr = fid_row(train_feats, feats)
        ism, iss = is_row(logits)
        rows[name] = {
            "fid_train": fr["value"],
            "fid_train_ci95": fr["ci95"],
            "fid_train_boot_std": fr["boot_std"],
            "is_mean": ism,
            "is_std": iss,
        }

    # untrained-model bound: random-init params through the same sampler
    p_rand = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(99), "dropout": jax.random.PRNGKey(99)},
        jnp.ones((1, 1, 1, 1)), jnp.zeros((1, 32, 32, 3)), None, train=False,
    )["params"]
    fu_feats, _ = gen_features([p_rand], "sde", "avg")
    fu = fid_row(train_feats, fu_feats)
    rows["untrained_model_sde"] = {
        "fid_train": fu["value"],
        "fid_train_ci95": fu["ci95"],
        "fid_train_boot_std": fu["boot_std"],
    }

    # FLD on the same features (x3 repeats; eval_fld.ipynb protocol —
    # the full BASELINE.md FLD table: joint ODE/SDE, per-model, pool-mixed)
    gen_feat_cache["pool_mixed_baseline"] = mixed
    fld_rows = ("model_A_sde", "model_B_sde", "model_A_ode", "model_B_ode",
                "joint_or_sde", "joint_or_ode", "pool_mixed_baseline")
    for name in fld_rows:
        m, s = fld_lib.fld_repeated(
            gen_feat_cache[name][:512], train_feats[:2048], test_feats[:2048],
            n_repeats=3, subsample=384,
        )
        if np.isfinite(m):
            rows.setdefault(name, {})["fld"] = [round(m, 3), round(s, 3)]
            # t(2) 97.5% quantile (4.303) over the 3 repeats
            hw = 4.303 * s / np.sqrt(3)
            rows[name]["fld_ci95"] = [round(m - hw, 3), round(m + hw, 3)]
        else:
            rows.setdefault(name, {})["fld_note"] = (
                "omitted: MoG fit degenerate on the random-feature stand-in"
            )
    # FLD sanity bound, same scale as the table rows
    m_noise, _ = fld_lib.fld_repeated(
        noise_feats[:512], train_feats[:2048], test_feats[:2048],
        n_repeats=3, subsample=384,
    )
    if np.isfinite(m_noise):
        rows["sanity_noise"]["fld"] = round(m_noise, 3)
    else:
        rows["sanity_noise"]["fld_note"] = (
            "omitted: MoG fit degenerate on the random-feature stand-in"
        )

    # BPD of each trained model on held-out data (eval_utils.py:14-45 analog)
    ds_test = ImageDataset("CIFAR10", "test", seed=0)
    batch = next(ds_test.batches(args.bpd_batch, uniform_dequantization=True,
                                 random_flip=False, scale_to_pm1=True, loop=False))
    x_test = jnp.asarray(batch["image"])
    sched = VPSchedule()
    for name in ("A", "B"):
        params = states[name].params_ema

        def score_apply(t, xx, p=params):
            tb = jnp.broadcast_to(t, (xx.shape[0], 1, 1, 1))
            return model.apply({"params": p}, tb, xx, None, train=False)

        bpd_fn = jax.jit(make_bpd_estimator(score_apply, sched, n_steps=args.bpd_steps))
        bpd, _ = bpd_fn(jax.random.PRNGKey(3), x_test)
        rows[f"model_{name}_sde"]["bpd_test"] = round(float(np.mean(np.asarray(bpd))), 4)

    # -- checked orderings with CI margins (VERDICT r3 weak #6 / r4 #5) -----
    # semantics live in eval/ordering.py (unit-tested; also reachable via
    # --rows_from to re-derive orderings from a finished QUALITY.json)
    from superdiff_tpu.eval.ordering import build_orderings, check, _ci

    orderings = build_orderings(rows)
    fld_gen = [n for n in fld_rows if "fld_ci95" in rows.get(n, {})]
    if fld_gen and "fld" in rows["sanity_noise"]:
        orderings.append(check(
            "fld: every generated row << sanity_noise",
            max(_ci(rows, n, "fld")[1] for n in fld_gen),
            _ci(rows, "sanity_noise", "fld")[0],
        ))

    report = {
        "protocol": "evals.ipynb cells 5/8/10/11/15 analog",
        "stand_ins": {
            "data": "synthetic class-structured CIFAR (data/datasets.py; real binaries absent)",
            "features": "models/inception.py with fixed seed-1234 random init (random-feature FID)",
        },
        "train_iters": args.iters,
        "n_samples": args.n_samples,
        "rows": rows,
        "orderings_checked": orderings,
        "ordering_note": (
            "separated = 95% CIs do not overlap (FID: 16-resample bootstrap "
            "over the generated pool; FLD: t(2) interval over 3 repeats); "
            "margin in metric units"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
