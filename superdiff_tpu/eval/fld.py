"""Feature Likelihood Divergence (FLD) — generalization-aware sample quality.

Role parity with ``notebooks/eval_fld.ipynb`` (the ``fld`` package over
DINOv2 features): a mixture of isotropic Gaussians is centered on the
generated samples' features, the per-center bandwidths are fit by maximizing
train-set likelihood, and the metric is the dimension-normalized negative
log-likelihood of the *test* set under that mixture — penalizing both poor
quality (test far from centers) and memorization (bandwidths collapse onto
train copies). Feature extraction is pluggable (the reference uses DINOv2;
any embedding network works); the math below is extractor-agnostic.

Bridge to the ``fld`` package's absolute values: the package (Jiralerspong
et al. 2023, the exact object ``FLD().compute_metric(train, test, gen)``
called in eval_fld.ipynb cell 1) reports the same train-fit MoG's
dimension-adjusted test NLL up to an affine normalization fixed by its
implementation (its Adam hyperparameters and NLL scaling). That shift is a
model-independent constant for a fixed feature extractor + dataset, so it
cancels in every comparison the reference's tables make (joint vs single vs
pool-mixed, ODE vs SDE). When the package and DINOv2 weights are available,
calibrate once via ``fld_bridge_constant`` and add it to our values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_d2(x: jnp.ndarray, centers: jnp.ndarray,
                 chunk: int = 1024) -> jnp.ndarray:
    """Squared euclidean distances (len(x), len(centers)), chunked over x."""
    x = jnp.asarray(x, jnp.float32)
    centers = jnp.asarray(centers, jnp.float32)
    c2 = jnp.sum(centers**2, axis=-1)

    @jax.jit
    def block(xb):
        return (
            jnp.sum(xb**2, axis=-1)[:, None]
            - 2.0 * xb @ centers.T
            + c2[None, :]
        )

    outs = [block(x[i : i + chunk]) for i in range(0, x.shape[0], chunk)]
    return jnp.maximum(jnp.concatenate(outs, axis=0), 0.0)


def _mog_ll_from_d2(d2: jnp.ndarray, log_var: jnp.ndarray, d: int):
    """log (1/n) sum_i N(x; c_i, e^{log_var_i} I) given precomputed d2."""
    ll = -0.5 * d2 / jnp.exp(log_var)[None] - 0.5 * d * (
        log_var[None] + jnp.log(2 * jnp.pi)
    )
    return jax.nn.logsumexp(ll, axis=-1) - jnp.log(d2.shape[-1])


def _logsumexp_gaussians(x: jnp.ndarray, centers: jnp.ndarray, log_var: jnp.ndarray):
    """log (1/n) sum_i N(x; c_i, e^{log_var_i} I) for each row of x."""
    return _mog_ll_from_d2(_pairwise_d2(x, centers), log_var, x.shape[-1])


def fit_mog_bandwidths(
    gen_feats: np.ndarray,
    train_feats: np.ndarray,
    n_steps: int = 200,
    lr: float = 0.1,
    d2: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Fit per-center isotropic log-variances by maximizing the train-set
    log-likelihood (the fld package's MoG fit).

    Numerics: distances are precomputed once (each optimization step is then
    O(B*n), not O(B*n*d)); log-variances start at each center's squared
    distance to its nearest train feature divided by the dimension, i.e. on
    the data's own scale, and are optimized with Adam. (The round-2
    fixed-step gradient ascent from log_var=0 diverged on large-norm
    features — gradients scale with d2/exp(log_var), which is astronomically
    stiff when the initialization is orders of magnitude off.)
    """
    import optax

    centers = jnp.asarray(gen_feats, jnp.float32)
    d = centers.shape[-1]
    if d2 is None:
        d2 = _pairwise_d2(jnp.asarray(train_feats), centers)
    # Bandwidths are clamped to the data's own squared-distance range: the
    # floor is the smallest strictly-positive per-dim squared distance (a
    # center sitting exactly on a train copy would otherwise drive its
    # variance to 0, and d2/exp(log_var) to inf -> NaN gradients — the
    # memorization case must stay finite so the metric can penalize it).
    pos = jnp.where(d2 > 0, d2, jnp.inf)
    finite_min = jnp.min(pos)
    lv_floor = jnp.log(
        jnp.where(jnp.isfinite(finite_min), finite_min, 1e-6) / d
    )
    lv_ceil = jnp.log(jnp.maximum(jnp.max(d2), 1e-6) / d) + 5.0
    lv = jnp.clip(jnp.log(jnp.maximum(jnp.min(d2, axis=0) / d, 1e-20)),
                  lv_floor, lv_ceil)
    opt = optax.adam(lr)

    @jax.jit
    def step(lv, opt_state):
        g = jax.grad(
            lambda l: -_mog_ll_from_d2(
                d2, jnp.clip(l, lv_floor, lv_ceil), d
            ).mean()
        )(lv)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(lv, updates), opt_state

    opt_state = opt.init(lv)
    for _ in range(n_steps):
        lv, opt_state = step(lv, opt_state)
    return np.asarray(jnp.clip(lv, lv_floor, lv_ceil))


def fld(
    gen_feats: np.ndarray,
    train_feats: np.ndarray,
    test_feats: np.ndarray,
    n_steps: int = 200,
) -> float:
    """Dimension-normalized test NLL of the train-fit generated-sample MoG.

    Lower is better. Matches the fld package's construction up to its
    baseline-shift constant (which cancels when comparing models, the only
    use in the reference's tables) — see the module docstring.
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


def fld_bridge_constant(
    gen_feats: np.ndarray,
    train_feats: np.ndarray,
    test_feats: np.ndarray,
) -> Optional[float]:
    """One-shot calibration against the ``fld`` pip package, when installed:
    returns (package FLD) - (our fld) on the same features. Add this constant
    to our values to report package-comparable absolute numbers. Returns
    None when the package is absent (this image has no egress)."""
    try:
        import torch
        from fld.metrics.FLD import FLD as _PkgFLD
    except Exception:
        return None
    pkg = _PkgFLD().compute_metric(
        torch.tensor(np.asarray(train_feats)),
        torch.tensor(np.asarray(test_feats)),
        torch.tensor(np.asarray(gen_feats)),
    )
    ours = fld(gen_feats, train_feats, test_feats)
    return float(pkg) - ours


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
            from ..utils.hub import allow_hub_download

            if not allow_hub_download():
                return None  # offline: fail fast to the gated-skip path
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
