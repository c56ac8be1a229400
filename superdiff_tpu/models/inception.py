"""JAX-native InceptionV3 (pool3 features + class logits) for on-TPU FID/IS.

The reference runs FID feature extraction through Keras InceptionV3
(``include_top=False, pooling='avg'``), resized to 299x299 and preprocessed
to [-1, 1], explicitly placed on ``'/TPU:i'`` devices
(``/root/reference/cifar/evaluation.py:6-33``); the Inception Score applies
Inception's own final layer to pool3 (``notebooks/evals.ipynb`` cell 13).
This module is a from-scratch functional JAX port of that exact network so
feature extraction runs in the same XLA program/device mesh as sampling —
no TF runtime, no host round-trip.

Design notes (TPU-first):
* Inference only. BatchNorm (``scale=False``, eps 1e-3 — the Keras
  configuration) is folded into each conv's kernel/bias at weight-conversion
  time, so the network is conv+bias+relu throughout: fewer HBM streams, and
  XLA fuses the bias+relu into the conv epilogue.
* Params are a flat ``{"conv0": {"kernel","bias"}, ..., "predictions":
  {"kernel","bias"}}`` dict; ``conv{i}`` follows the Keras graph-construction
  order, which is also how the released h5 files number their layers — the
  converter below keys on that order.
* TF average pooling with SAME padding excludes the padding from the
  divisor; ``flax.linen.avg_pool(count_include_pad=False)`` reproduces it.
* 299x299 bilinear resize matches ``tf.image.resize`` (half-pixel centers;
  antialiasing is irrelevant for upsampling).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.linen import avg_pool, max_pool

Params = Dict[str, Dict[str, jnp.ndarray]]

POOL_DIM = 2048
NUM_CLASSES = 1000
BN_EPS = 1e-3  # Keras BatchNormalization default, used by inception_v3


class _Store:
    """Parameter store that either serves an existing tree or materializes
    randomly-initialized params on first use (init and apply share one
    architecture walk, so the graph is written exactly once)."""

    def __init__(self, params: Optional[Params] = None, rng=None):
        self.params = {} if params is None else params
        self.rng = rng
        self.order = []

    def conv(self, name: str, kernel_shape):
        self.order.append(name)
        if name not in self.params:
            self.rng, k = jax.random.split(self.rng)
            fan_in = kernel_shape[0] * kernel_shape[1] * kernel_shape[2]
            self.params[name] = {
                "kernel": jax.random.normal(k, kernel_shape, jnp.float32)
                * np.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((kernel_shape[3],), jnp.float32),
            }
        return self.params[name]

    def dense(self, name: str, shape):
        self.order.append(name)
        if name not in self.params:
            self.rng, k = jax.random.split(self.rng)
            self.params[name] = {
                "kernel": jax.random.normal(k, shape, jnp.float32)
                * np.sqrt(1.0 / shape[0]),
                "bias": jnp.zeros((shape[1],), jnp.float32),
            }
        return self.params[name]


def _forward(store: _Store, x: jnp.ndarray, include_top: bool, dtype):
    """The Keras InceptionV3 graph, conv-counter order identical to
    ``keras.applications.inception_v3`` source order."""
    counter = [0]

    def conv(x, filters, kh, kw, strides=(1, 1), padding="SAME"):
        name = f"conv{counter[0]}"
        counter[0] += 1
        p = store.conv(name, (kh, kw, x.shape[-1], filters))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            p["kernel"].astype(dtype),
            window_strides=strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + p["bias"].astype(dtype)
        return jax.nn.relu(y)

    def mixed_a(x, pool_filters):
        b1 = conv(x, 64, 1, 1)
        b5 = conv(conv(x, 48, 1, 1), 64, 5, 5)
        b3 = conv(conv(conv(x, 64, 1, 1), 96, 3, 3), 96, 3, 3)
        bp = avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False)
        bp = conv(bp, pool_filters, 1, 1)
        return jnp.concatenate([b1, b5, b3, bp], -1)

    def mixed_c(x, c77):
        b1 = conv(x, 192, 1, 1)
        b7 = conv(conv(conv(x, c77, 1, 1), c77, 1, 7), 192, 7, 1)
        bd = conv(x, c77, 1, 1)
        bd = conv(bd, c77, 7, 1)
        bd = conv(bd, c77, 1, 7)
        bd = conv(bd, c77, 7, 1)
        bd = conv(bd, 192, 1, 7)
        bp = avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False)
        bp = conv(bp, 192, 1, 1)
        return jnp.concatenate([b1, b7, bd, bp], -1)

    def mixed_e(x):
        b1 = conv(x, 320, 1, 1)
        b3 = conv(x, 384, 1, 1)
        b3 = jnp.concatenate([conv(b3, 384, 1, 3), conv(b3, 384, 3, 1)], -1)
        bd = conv(conv(x, 448, 1, 1), 384, 3, 3)
        bd = jnp.concatenate([conv(bd, 384, 1, 3), conv(bd, 384, 3, 1)], -1)
        bp = avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=False)
        bp = conv(bp, 192, 1, 1)
        return jnp.concatenate([b1, b3, bd, bp], -1)

    # stem
    x = conv(x, 32, 3, 3, strides=(2, 2), padding="VALID")
    x = conv(x, 32, 3, 3, padding="VALID")
    x = conv(x, 64, 3, 3)
    x = max_pool(x, (3, 3), (2, 2), "VALID")
    x = conv(x, 80, 1, 1, padding="VALID")
    x = conv(x, 192, 3, 3, padding="VALID")
    x = max_pool(x, (3, 3), (2, 2), "VALID")

    # mixed 0-2 (35x35)
    x = mixed_a(x, 32)
    x = mixed_a(x, 64)
    x = mixed_a(x, 64)

    # mixed 3 (grid reduce to 17x17)
    b3 = conv(x, 384, 3, 3, strides=(2, 2), padding="VALID")
    bd = conv(conv(x, 64, 1, 1), 96, 3, 3)
    bd = conv(bd, 96, 3, 3, strides=(2, 2), padding="VALID")
    x = jnp.concatenate([b3, bd, max_pool(x, (3, 3), (2, 2), "VALID")], -1)

    # mixed 4-7 (17x17)
    x = mixed_c(x, 128)
    x = mixed_c(x, 160)
    x = mixed_c(x, 160)
    x = mixed_c(x, 192)

    # mixed 8 (grid reduce to 8x8)
    b3 = conv(conv(x, 192, 1, 1), 320, 3, 3, strides=(2, 2), padding="VALID")
    b7 = conv(conv(conv(x, 192, 1, 1), 192, 1, 7), 192, 7, 1)
    b7 = conv(b7, 192, 3, 3, strides=(2, 2), padding="VALID")
    x = jnp.concatenate([b3, b7, max_pool(x, (3, 3), (2, 2), "VALID")], -1)

    # mixed 9-10 (8x8)
    x = mixed_e(x)
    x = mixed_e(x)

    pool = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (N, 2048)
    out = {"pool": pool}
    if include_top:
        p = store.dense("predictions", (POOL_DIM, NUM_CLASSES))
        out["logits"] = pool @ p["kernel"] + p["bias"]
    return out


def apply(
    params: Params,
    images: jnp.ndarray,
    include_top: bool = True,
    dtype=jnp.float32,
    resize: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Run InceptionV3. ``images``: (N, H, W, 3), uint8 or float in [0, 255].

    Applies the reference's preprocessing (resize to 299, scale to [-1, 1],
    ``cifar/evaluation.py:14-19``). Returns ``{"pool": (N, 2048) fp32
    [, "logits": (N, 1000) fp32]}``.
    """
    x = images.astype(jnp.float32)
    if resize and x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    x = x / 127.5 - 1.0
    return _forward(_Store(params), x, include_top=include_top, dtype=dtype)


def init_params(key, include_top: bool = True) -> Params:
    """Randomly-initialized parameter tree (for tests / structural checks)."""
    store = _Store(params=None, rng=key)
    # spatial size is irrelevant to parameter shapes; use the minimum legal.
    x = jnp.zeros((1, 75, 75, 3))
    _forward(store, x, include_top=include_top, dtype=jnp.float32)
    return store.params


def num_convs() -> int:
    return 94


# -- weight conversion -------------------------------------------------------


def _fold_bn(kernel, beta, mean, var):
    """Fold inference BatchNorm (scale=False -> gamma=1) into conv weights:
    y = (conv(x) - mean) / sqrt(var+eps) + beta  ==  conv'(x) + bias'."""
    scale = 1.0 / np.sqrt(var + BN_EPS)
    return kernel * scale[None, None, None, :], beta - mean * scale


def _numbered(names, prefix):
    """Sort Keras auto-numbered layer names ('conv2d', 'conv2d_1', ...) by
    index; a bare name counts as index 0. Released h5 files start at _1 —
    ordering by suffix handles both conventions."""
    out = []
    for n in names:
        if n == prefix:
            out.append((0, n))
        elif n.startswith(prefix + "_"):
            suffix = n[len(prefix) + 1 :]
            if suffix.isdigit():
                out.append((int(suffix), n))
    return [n for _, n in sorted(out)]


def convert_keras_h5(h5_path: str) -> Params:
    """Convert a Keras InceptionV3 ``.h5`` weights file (the
    ``inception_v3_weights_tf_dim_ordering_tf_kernels[_notop].h5`` release
    layout) into this module's folded parameter tree."""
    import h5py

    params: Params = {}
    with h5py.File(h5_path, "r") as f:
        if "layers" in f and "conv2d" in f["layers"]:
            return _convert_keras3_h5(f)
        root = f["model_weights"] if "model_weights" in f else f

        def leaf(group):
            # h5 layout: root[layer_name][layer_name][weight_name]
            sub = group
            keys = list(sub.keys())
            while len(keys) == 1 and not hasattr(sub[keys[0]], "shape"):
                sub = sub[keys[0]]
                keys = list(sub.keys())
            return sub

        convs = _numbered(root.keys(), "conv2d")
        bns = _numbered(root.keys(), "batch_normalization")
        if len(convs) != num_convs() or len(bns) != num_convs():
            raise ValueError(
                f"unexpected layer counts: {len(convs)} convs, {len(bns)} bns"
            )
        for i, (cn, bn) in enumerate(zip(convs, bns)):
            cg, bg = leaf(root[cn]), leaf(root[bn])
            kernel = np.asarray(cg["kernel:0"])
            beta = np.asarray(bg["beta:0"])
            mean = np.asarray(bg["moving_mean:0"])
            var = np.asarray(bg["moving_variance:0"])
            k, b = _fold_bn(kernel, beta, mean, var)
            params[f"conv{i}"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        preds = _numbered(root.keys(), "predictions")
        if preds:
            pg = leaf(root[preds[0]])
            params["predictions"] = {
                "kernel": jnp.asarray(np.asarray(pg["kernel:0"])),
                "bias": jnp.asarray(np.asarray(pg["bias:0"])),
            }
    return params


# Keras-3 `save_weights` names the h5 groups by *topological* position
# (model.layers order), discarding the creation-order auto-names the graph
# walk in `_forward` follows. The permutation is a fixed property of the
# InceptionV3 graph: _KERAS3_TOPO[i] = creation-order index of the i-th
# conv/BN group in the file (identical for convs and BNs).
_KERAS3_TOPO = [
    0, 1, 2, 3, 4, 8, 6, 9, 5, 7, 10, 11, 15, 13, 16, 12, 14, 17, 18, 22,
    20, 23, 19, 21, 24, 25, 27, 28, 26, 29, 34, 35, 31, 36, 32, 37, 30, 33,
    38, 39, 44, 45, 41, 46, 42, 47, 40, 43, 48, 49, 54, 55, 51, 56, 52, 57,
    50, 53, 58, 59, 64, 65, 61, 66, 62, 67, 60, 63, 68, 69, 72, 73, 70, 74,
    71, 75, 80, 77, 81, 78, 79, 82, 83, 76, 84, 89, 86, 90, 87, 88, 91, 92,
    85, 93,
]


def _convert_keras3_h5(f) -> Params:
    """Keras-3 ``model.save_weights('*.weights.h5')`` layout:
    ``layers/<topo_name>/vars/{0,1,2}`` — conv vars=[kernel]; BN with
    ``scale=False`` vars=[beta, moving_mean, moving_variance]; the top
    Dense is auto-named ``dense`` (or keeps ``predictions``)."""
    root = f["layers"]
    params: Params = {}
    convs = _numbered(root.keys(), "conv2d")
    bns = _numbered(root.keys(), "batch_normalization")
    if len(convs) != num_convs() or len(bns) != num_convs():
        raise ValueError(f"unexpected layer counts: {len(convs)} convs, {len(bns)} bns")
    for topo, (cn, bn) in enumerate(zip(convs, bns)):
        i = _KERAS3_TOPO[topo]
        kernel = np.asarray(root[cn]["vars"]["0"])
        bv = root[bn]["vars"]
        beta, mean, var = (np.asarray(bv[k]) for k in ("0", "1", "2"))
        k, b = _fold_bn(kernel, beta, mean, var)
        params[f"conv{i}"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    for dense_name in ("predictions", "dense"):
        if dense_name in root:
            dv = root[dense_name]["vars"]
            params["predictions"] = {
                "kernel": jnp.asarray(np.asarray(dv["0"])),
                "bias": jnp.asarray(np.asarray(dv["1"])),
            }
            break
    return params


def convert_keras_model(model) -> Params:
    """Convert a live ``tf.keras`` InceptionV3 instance (any weights,
    including random init — used by the parity test)."""
    params: Params = {}
    by_name = {}
    for layer in model.layers:
        kind = type(layer).__name__
        if kind in ("Conv2D", "BatchNormalization"):
            by_name[layer.name] = layer
        elif kind == "Dense":
            k, b = layer.get_weights()
            params["predictions"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    # model.layers is topologically ordered; creation order (which the graph
    # walk in _forward follows) is recovered from the auto-numbered names
    convs = [by_name[n] for n in _numbered(by_name, "conv2d")]
    bns = [by_name[n] for n in _numbered(by_name, "batch_normalization")]
    if len(convs) != num_convs() or len(bns) != num_convs():
        raise ValueError(f"unexpected counts: {len(convs)} convs, {len(bns)} bns")
    for i, (c, bnl) in enumerate(zip(convs, bns)):
        (kernel,) = c.get_weights()
        beta, mean, var = bnl.get_weights()
        k, b = _fold_bn(kernel, beta, mean, var)
        params[f"conv{i}"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    return params


def save_npz(params: Params, path: str) -> None:
    flat = {}
    for name, p in params.items():
        for wn, w in p.items():
            flat[f"{name}/{wn}"] = np.asarray(w)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> Params:
    params: Params = {}
    with np.load(path) as f:
        for key in f.files:
            name, wn = key.rsplit("/", 1)
            params.setdefault(name, {})[wn] = jnp.asarray(f[key])
    return params


def load_params(path: str) -> Params:
    """Load converted params from ``.npz``, or convert a Keras ``.h5``."""
    if path.endswith(".h5") or path.endswith(".hdf5"):
        return convert_keras_h5(path)
    return load_npz(path)


def make_feature_fn(params: Params, batch_size: int = 128, with_logits: bool = False):
    """Batched jitted extractor: uint8 images -> (N, 2048) pool3 features
    (and optionally (N, 1000) logits). Pads the trailing batch so one XLA
    program serves every call."""
    include_top = with_logits and "predictions" in params

    @jax.jit
    def run(x):
        return apply(params, x, include_top=include_top)

    def feature_fn(images: np.ndarray):
        pools, logits = [], []
        n = len(images)
        for i in range(0, n, batch_size):
            chunk = np.asarray(images[i : i + batch_size])
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out = run(jnp.asarray(chunk))
            pools.append(np.asarray(out["pool"])[: batch_size - pad or None])
            if include_top:
                logits.append(np.asarray(out["logits"])[: batch_size - pad or None])
        pool = np.concatenate(pools, 0)[:n]
        if include_top:
            return pool, np.concatenate(logits, 0)[:n]
        return pool

    return feature_fn
