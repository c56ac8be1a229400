"""Input pipeline with the reference's split DSL, tfds-free.

Parity target: ``cifar/datasets.py:68-183``. The reference uses
tfds + tf.data; this rebuild keeps the *semantics* — uniform dequantization,
random flips, [-1, 1] scaling, and the split DSL used to carve the datasets
the two composed models are trained on:

  ``train[:50%]`` / ``train[50%:]``  — percentage slices
  ``train<5`` / ``train>5``          — class-filtered splits (< is labels 0..4,
                                       > is labels 5..9; ``datasets.py:150-173``)

Sources, in order of preference:
  1. local CIFAR-10 python batches (``cifar-10-batches-py``) under
     ``SUPERDIFF_DATA_DIR`` (no network in this environment),
  2. a deterministic synthetic stand-in with the same shapes/labels so every
     pipeline stage can run end-to-end without the real data.

Batches are host numpy, shape (B, H, W, C) float32 in [0, 1]; sharding onto
the mesh happens in the trainer (``parallel.shard_batch``) — no per-device
leading dims (the pmap-era layout of ``cifar/datasets.py:83-96`` is gone).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import re
from typing import Iterator, Optional, Tuple

import numpy as np

_SPLIT_RE = re.compile(
    r"^(?P<base>\w+)"
    r"(?:\[(?P<lo>\d+)?%?:(?P<hi>\d+)?%?\]|(?P<op>[<>])(?P<cls>\d+))?$"
)


@dataclasses.dataclass(frozen=True)
class SplitSpec:
    base: str  # 'train' | 'test'
    lo_pct: Optional[int] = None
    hi_pct: Optional[int] = None
    class_op: Optional[str] = None  # '<' | '>'
    class_val: Optional[int] = None

    @staticmethod
    def parse(split: str) -> "SplitSpec":
        m = _SPLIT_RE.match(split.replace(" ", ""))
        if not m:
            raise ValueError(f"cannot parse split: {split!r}")
        d = m.groupdict()
        return SplitSpec(
            base=d["base"],
            lo_pct=int(d["lo"]) if d["lo"] else (0 if ":" in split else None),
            hi_pct=int(d["hi"]) if d["hi"] else (100 if ":" in split else None),
            class_op=d["op"],
            class_val=int(d["cls"]) if d["cls"] else None,
        )

    def apply(self, images: np.ndarray, labels: np.ndarray):
        if self.class_op == "<":
            mask = labels < self.class_val
            return images[mask], labels[mask]
        if self.class_op == ">":
            # reference semantics: 'train>5' keeps labels >= 5
            # (cifar/datasets.py filters the complement of '<5')
            mask = labels >= self.class_val
            return images[mask], labels[mask]
        n = len(images)
        lo = (self.lo_pct or 0) * n // 100
        hi = (self.hi_pct if self.hi_pct is not None else 100) * n // 100
        return images[lo:hi], labels[lo:hi]


def _load_cifar10_local(data_dir: str) -> Optional[Tuple[np.ndarray, ...]]:
    root = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(root):
        return None
    xs, ys = [], []
    for i in range(1, 6):
        with open(os.path.join(root, f"data_batch_{i}"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.append(np.asarray(d[b"labels"]))
    train_x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    train_y = np.concatenate(ys)
    with open(os.path.join(root, "test_batch"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    test_x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    test_y = np.asarray(d[b"labels"])
    return train_x, train_y, test_x, test_y


def _synthetic_cifar(n_train=50_000, n_test=10_000, seed=0):
    """Deterministic class-structured stand-in (shapes/labels of CIFAR-10)."""
    rng = np.random.default_rng(seed)
    def make(n):
        y = rng.integers(0, 10, size=n)
        base = (y[:, None, None, None] * 25).astype(np.uint8)
        x = base + rng.integers(0, 64, size=(n, 32, 32, 3)).astype(np.uint8)
        return x, y
    tr = make(n_train)
    te = make(n_test)
    return tr[0], tr[1], te[0], te[1]


class ImageDataset:
    """In-memory image dataset with an infinite shuffled batch iterator."""

    def __init__(
        self,
        name: str = "cifar10",
        split: str = "train",
        data_dir: Optional[str] = None,
        seed: int = 0,
    ):
        data_dir = data_dir or os.environ.get("SUPERDIFF_DATA_DIR", "/root/data")
        loaded = _load_cifar10_local(data_dir) if name.lower() == "cifar10" else None
        self.synthetic = loaded is None
        if loaded is None:
            loaded = _synthetic_cifar()
        train_x, train_y, test_x, test_y = loaded
        spec = SplitSpec.parse(split)
        x, y = (train_x, train_y) if spec.base == "train" else (test_x, test_y)
        self.images, self.labels = spec.apply(x, y)
        self.seed = seed

    def __len__(self):
        return len(self.images)

    def batches(
        self,
        batch_size: int,
        *,
        uniform_dequantization: bool = True,
        random_flip: bool = True,
        scale_to_pm1: bool = True,
        loop: bool = True,
    ) -> Iterator[dict]:
        """Yield {'image': (B,H,W,C) float32, 'label': (B,) int32} forever."""
        rng = np.random.default_rng(self.seed)
        n = len(self.images)
        while True:
            perm = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = perm[i : i + batch_size]
                img = self.images[idx].astype(np.float32)
                if uniform_dequantization:
                    img = (img + rng.uniform(size=img.shape).astype(np.float32)) / 256.0
                else:
                    img = img / 255.0
                if random_flip:
                    flip = rng.random(batch_size) < 0.5
                    img[flip] = img[flip, :, ::-1]
                if scale_to_pm1:
                    img = img * 2.0 - 1.0
                yield {"image": img, "label": self.labels[idx].astype(np.int32)}
            if not loop:
                return


class PrefetchIterator:
    """Background-thread prefetcher: overlaps host batch prep (dequantize,
    flip, scale) with device compute. The reference leans on tf.data's
    threading (``cifar/datasets.py:156-158``); this is the dependency-free
    equivalent for the numpy pipeline."""

    def __init__(self, iterator, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._done = object()

        def worker():
            try:
                for item in iterator:
                    self._q.put(item)
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item


def get_image_scaler(centered: bool = True):
    return (lambda x: x * 2.0 - 1.0) if centered else (lambda x: x)


def get_image_inverse_scaler(centered: bool = True):
    return (lambda x: (x + 1.0) / 2.0) if centered else (lambda x: x)
