"""FID / Inception Score evaluation.

Parity target: ``cifar/evaluation.py`` + ``notebooks/evals.ipynb`` — pool3
features from InceptionV3, exact FID via matrix sqrt, IS from the logits
head. Differences by design:

* Feature extraction is batched through whatever accelerator TF sees; the
  reference already placed Inception on ``'/TPU:i'`` devices explicitly
  (``cifar/evaluation.py:26``). Here TF is optional: with no TF (or no
  pretrained weights — this environment has no network egress), callers can
  pass any feature function with the same signature, and the statistics /
  FID math below is backend-free numpy/scipy.
* Exact matrix sqrt stays on host CPU via scipy (``evaluation.py:40``), the
  one part of the metric XLA should not own.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def matrix_sqrt_spd(a: np.ndarray) -> np.ndarray:
    """Principal square root of a (near-)SPD matrix on host CPU."""
    import scipy.linalg

    s, info = scipy.linalg.sqrtm(a, disp=False)
    del info
    return np.real(s)


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """Exact Fréchet distance between two Gaussians (evaluation.py:35-45)."""
    diff = mu1 - mu2
    covmean = matrix_sqrt_spd(cov1 @ cov2)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(covmean))


def feature_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mu, cov


def fid_from_features(ref_feats: np.ndarray, gen_feats: np.ndarray) -> float:
    m1, c1 = feature_statistics(ref_feats)
    m2, c2 = feature_statistics(gen_feats)
    return frechet_distance(m1, c1, m2, c2)


def fid_bootstrap(
    ref_feats: np.ndarray,
    gen_feats: np.ndarray,
    n_boot: int = 16,
    seed: int = 0,
) -> dict:
    """FID with a bootstrap 95% CI over the *generated* sample
    (VERDICT r3 weak #6: at n=1024 FID carries several points of sampling
    noise, so ordering claims need margins).

    The reference set is held fixed (it is the larger, common side of
    every comparison); each bootstrap resamples ``gen_feats`` with
    replacement.  Cost per resample is one covariance + one symmetric
    eigendecomposition instead of a non-symmetric ``sqrtm``:
    with ``A = C1^{1/2}`` precomputed once,
    ``tr sqrtm(C1 C2) = tr sqrtm(A C2 A) = sum sqrt(eigvalsh(A C2 A))``
    (similarity ``C1 C2 = A (A C2 A) A^{-1}`` — same spectrum, and
    ``A C2 A`` is SPD).

    Returns ``{"value", "boot_mean", "boot_std", "ci95": [lo, hi]}`` where
    ``value`` is the plain full-sample FID (identical to
    :func:`fid_from_features`) and the CI is the percentile interval of
    the bootstrap replicates.
    """
    rng = np.random.default_rng(seed)
    mu1, c1 = feature_statistics(ref_feats)
    a = matrix_sqrt_spd(c1)
    tr_c1 = float(np.trace(c1))

    def fd(g: np.ndarray) -> float:
        mu2, c2 = feature_statistics(g)
        diff = mu1 - mu2
        ev = np.linalg.eigvalsh(a @ c2 @ a)
        tr_sqrt = np.sqrt(np.clip(ev, 0.0, None)).sum()
        return float(diff @ diff + tr_c1 + np.trace(c2) - 2.0 * tr_sqrt)

    value = fd(gen_feats)
    n = len(gen_feats)
    boots = np.array(
        [fd(gen_feats[rng.integers(0, n, n)]) for _ in range(n_boot)]
    )
    lo, hi = np.percentile(boots, [2.5, 97.5])
    return {
        "value": value,
        "boot_mean": float(boots.mean()),
        "boot_std": float(boots.std(ddof=1)),
        "ci95": [float(lo), float(hi)],
    }


def inception_score(logits: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS from class logits: exp(E KL(p(y|x) || p(y)))."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-10) - np.log(py + 1e-10))).sum(-1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def get_jax_inception_feature_fn(
    weights_path: str, with_logits: bool = False
) -> Optional[Callable]:
    """On-TPU InceptionV3 extractor (``models/inception.py`` port): runs
    pool3 (and optionally the logits head) as a jitted XLA program on the
    same devices as sampling — the TPU-native replacement for the
    reference's TF-on-'/TPU:i' placement (``cifar/evaluation.py:21-33``).

    ``weights_path``: a converted ``.npz`` or any Keras InceptionV3 ``.h5``
    (legacy release layout or Keras-3 ``.weights.h5``). Returns None if the
    file can't be read/converted.
    """
    from ..models import inception

    try:
        params = inception.load_params(weights_path)
    except Exception:
        return None
    return inception.make_feature_fn(params, with_logits=with_logits)


def get_inception_feature_fn(weights_path: Optional[str] = None) -> Optional[Callable]:
    """InceptionV3 pool3 feature extractor, or None when unavailable.

    Prefers the JAX-native port (runs on the TPU mesh); falls back to Keras
    for 'imagenet' (download — needs egress) or unconvertible files.
    """
    if weights_path and weights_path != "imagenet":
        fn = get_jax_inception_feature_fn(weights_path)
        if fn is not None:
            return fn
    try:
        import tensorflow as tf
    except Exception:
        return None
    try:
        model = tf.keras.applications.InceptionV3(
            include_top=False, pooling="avg", weights=weights_path
        )
    except Exception:
        return None

    def feature_fn(uint8_images: np.ndarray, batch_size: int = 256) -> np.ndarray:
        outs = []
        for i in range(0, len(uint8_images), batch_size):
            x = uint8_images[i : i + batch_size].astype(np.float32)
            x = tf.image.resize(x, (299, 299))
            x = tf.keras.applications.inception_v3.preprocess_input(x)
            outs.append(model(x, training=False).numpy())
        return np.concatenate(outs, axis=0)

    return feature_fn


def get_inception_logits_fn(weights_path: Optional[str] = None) -> Optional[Callable]:
    """Full InceptionV3 class-logits extractor for IS (the reference computes
    IS from Inception's own final layer over pool3, ``evals.ipynb`` cell 13)."""
    if weights_path and weights_path != "imagenet":
        from ..models import inception

        try:
            params = inception.load_params(weights_path)
        except Exception:
            params = None
        if params is not None and "predictions" in params:
            fns = {}  # one compiled fn per batch_size (avoid per-call retrace)

            def jax_logits_fn(imgs, batch_size: int = 256, _params=params):
                if batch_size not in fns:
                    fns[batch_size] = inception.make_feature_fn(
                        _params, batch_size=batch_size, with_logits=True
                    )
                return fns[batch_size](imgs)[1]

            return jax_logits_fn
    try:
        import tensorflow as tf

        model = tf.keras.applications.InceptionV3(include_top=True, weights=weights_path)
    except Exception:
        return None

    def logits_fn(uint8_images: np.ndarray, batch_size: int = 256) -> np.ndarray:
        outs = []
        for i in range(0, len(uint8_images), batch_size):
            x = uint8_images[i : i + batch_size].astype(np.float32)
            x = tf.image.resize(x, (299, 299))
            x = tf.keras.applications.inception_v3.preprocess_input(x)
            outs.append(np.log(model(x, training=False).numpy() + 1e-10))
        return np.concatenate(outs, axis=0)

    return logits_fn


def load_dataset_stats(path: str) -> np.ndarray:
    """Load precomputed pool3 stats npz (``evaluation.py:47-57`` format)."""
    with open(path, "rb") as f:
        return np.load(f)["pool_3"]
