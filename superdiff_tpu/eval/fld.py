"""Feature Likelihood Divergence (FLD) — generalization-aware sample quality.

Role parity with ``notebooks/eval_fld.ipynb`` (the ``fld`` package over
DINOv2 features): a mixture of isotropic Gaussians is centered on the
generated samples' features, the per-center bandwidths are fit by maximizing
train-set likelihood (EM), and the metric is the dimension-normalized
negative log-likelihood of the *test* set under that mixture — penalizing
both poor quality (test far from centers) and memorization (bandwidths
collapse onto train copies). Feature extraction is pluggable (the reference
uses DINOv2; any embedding network works); the math below is
extractor-agnostic numpy/JAX.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _logsumexp_gaussians(x: jnp.ndarray, centers: jnp.ndarray, log_var: jnp.ndarray):
    """log (1/n) sum_i N(x; c_i, e^{log_var_i} I) for each row of x."""
    d = x.shape[-1]
    d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # (B, n)
    ll = -0.5 * d2 / jnp.exp(log_var)[None] - 0.5 * d * (
        log_var[None] + jnp.log(2 * jnp.pi)
    )
    return jax.nn.logsumexp(ll, axis=-1) - jnp.log(centers.shape[0])


def fit_mog_bandwidths(
    gen_feats: np.ndarray,
    train_feats: np.ndarray,
    n_steps: int = 100,
    lr: float = 0.2,
    init_log_var: float = 0.0,
) -> np.ndarray:
    """Fit per-center isotropic log-variances by gradient ascent on the
    train-set log-likelihood (the fld package's MoG fit)."""
    centers = jnp.asarray(gen_feats)
    train = jnp.asarray(train_feats)
    log_var = jnp.full((centers.shape[0],), init_log_var)

    @jax.jit
    def step(lv):
        g = jax.grad(lambda l: _logsumexp_gaussians(train, centers, l).mean())(lv)
        return lv + lr * g

    for _ in range(n_steps):
        log_var = step(log_var)
    return np.asarray(log_var)


def fld(
    gen_feats: np.ndarray,
    train_feats: np.ndarray,
    test_feats: np.ndarray,
    n_steps: int = 100,
) -> float:
    """Dimension-normalized test NLL of the train-fit generated-sample MoG.

    Lower is better. Matches the fld package's construction up to its
    baseline-shift constant (which cancels when comparing models, the only
    use in the reference's tables).
    """
    log_var = fit_mog_bandwidths(gen_feats, train_feats, n_steps=n_steps)
    ll = _logsumexp_gaussians(
        jnp.asarray(test_feats), jnp.asarray(gen_feats), jnp.asarray(log_var)
    )
    d = gen_feats.shape[-1]
    return float(-np.asarray(ll).mean() / d)


def fld_repeated(
    gen_feats: np.ndarray,
    train_feats: np.ndarray,
    test_feats: np.ndarray,
    n_repeats: int = 10,
    subsample: Optional[int] = 10_000,
    seed: int = 0,
) -> Tuple[float, float]:
    """Mean +/- std over resampled subsets (the notebook's x10 protocol)."""
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n_repeats):
        idx = (
            rng.choice(len(gen_feats), min(subsample or len(gen_feats), len(gen_feats)), replace=False)
        )
        vals.append(fld(gen_feats[idx], train_feats, test_feats))
    return float(np.mean(vals)), float(np.std(vals))


def get_dinov2_feature_fn() -> Optional[callable]:
    """DINOv2 feature extractor via torch hub/transformers; None when
    weights are unavailable (no egress here)."""
    try:
        import torch
        from transformers import AutoImageProcessor, AutoModel

        try:
            proc = AutoImageProcessor.from_pretrained("facebook/dinov2-base", local_files_only=True)
            model = AutoModel.from_pretrained("facebook/dinov2-base", local_files_only=True)
        except Exception:
            proc = AutoImageProcessor.from_pretrained("facebook/dinov2-base")
            model = AutoModel.from_pretrained("facebook/dinov2-base")
        model.eval()
    except Exception:
        return None

    def feature_fn(uint8_images: np.ndarray, batch_size: int = 64) -> np.ndarray:
        outs = []
        with torch.no_grad():
            for i in range(0, len(uint8_images), batch_size):
                inputs = proc(images=list(uint8_images[i : i + batch_size]), return_tensors="pt")
                outs.append(model(**inputs).pooler_output.numpy())
        return np.concatenate(outs, 0)

    return feature_fn
