"""De-risk the queued on-chip FLD quality run: reproduce the exact
quality_report.py FLD path (seed-1234 random-feature InceptionV3 on the
synthetic-CIFAR fallback) on CPU and check every fld_repeated call is finite.

Round-2's QUALITY run produced only "MoG fit degenerate" notes; the fit was
made robust in round 3 but never re-executed on-chip (tunnel outage). This
script proves the repaired path end-to-end on the same feature stand-in.
Result (2026-08-18, CPU): gen_like -3.171 +/- 0.001, train_subset
-3.370 +/- 0.071, noise 0.008 +/- 0.004 — all finite, orderings correct
(train < generated-like << noise).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from superdiff_tpu.data.datasets import ImageDataset
from superdiff_tpu.eval import fld as fld_lib
from superdiff_tpu.models import inception

feat_params = jax.jit(lambda k: inception.init_params(k, include_top=False))(
    jax.random.PRNGKey(1234)
)
feature_fn = inception.make_feature_fn(feat_params, batch_size=64)


def split_features(split, n):
    ds = ImageDataset("CIFAR10", split, seed=0)
    feats, seen = [], 0
    for b in ds.batches(64, uniform_dequantization=False, random_flip=False,
                        scale_to_pm1=False, loop=False):
        imgs = (b["image"] * 255).astype(np.uint8)
        feats.append(feature_fn(imgs))
        seen += len(imgs)
        if seen >= n:
            break
    return np.concatenate(feats)[:n]


print("extracting train/test features", flush=True)
train_feats = split_features("train", 2048)
test_feats = split_features("test", 2048)

# generated-like pool: blurred + perturbed train images (what a weak/early
# sampler emits: smooth, roughly in-distribution, not memorized)
ds = ImageDataset("CIFAR10", "train", seed=7)
b = next(ds.batches(512, uniform_dequantization=False, random_flip=False,
                    scale_to_pm1=False, loop=False))
imgs = b["image"]
rng = np.random.default_rng(3)
blur = 0.25 * (np.roll(imgs, 1, 1) + np.roll(imgs, -1, 1)
               + np.roll(imgs, 1, 2) + np.roll(imgs, -1, 2))
gen = np.clip(0.7 * imgs + 0.3 * blur + 0.05 * rng.normal(size=imgs.shape), 0, 1)
gen_feats = feature_fn((gen * 255).astype(np.uint8))

noise_imgs = np.random.default_rng(0).integers(0, 256, (512, 32, 32, 3),
                                               dtype=np.uint8)
noise_feats = feature_fn(noise_imgs)

print("running fld_repeated on each pool", flush=True)
results = {}
for name, g in (("gen_like", gen_feats), ("train_subset", train_feats[:512]),
                ("noise", noise_feats)):
    m, s = fld_lib.fld_repeated(g[:512], train_feats[:2048], test_feats[:2048],
                                n_repeats=3, subsample=384)
    results[name] = (float(m), float(s))
    print(f"{name}: fld = {m:.3f} +/- {s:.3f} finite={np.isfinite(m)}", flush=True)

assert all(np.isfinite(v[0]) for v in results.values()), results
# orderings a working FLD must show on these pools
assert results["train_subset"][0] < results["noise"][0], results
assert results["gen_like"][0] < results["noise"][0], results
print("FLD DERISK OK", results)
