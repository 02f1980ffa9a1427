"""CIFAR-10 pipeline (reference `dataset/cifar.py:7-58` parity, NHWC).

Reads the standard ``cifar-10-batches-py`` pickle files directly with numpy —
no torchvision dependency and no network access (this environment has zero
egress; point ``data_path`` at an existing download). Normalization matches
the reference: mean/std 0.5 per channel → values in [-1, 1] (`:24-27`).
Batch contract: ``{"images": [B,32,32,3] float32, "prompt": [B] int32}``.
"""

from __future__ import annotations

import os
import pickle
import tarfile

import numpy as np

from .loader import ArrayDataLoader

__all__ = ["CIFAR10_CLASSES", "CIFAR10DataLoader", "load_cifar10_arrays"]

CIFAR10_CLASSES = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]


def _find_batches_dir(data_path: str) -> str:
    candidates = [
        os.path.join(data_path, "cifar-10-batches-py"),
        data_path,
    ]
    for c in candidates:
        if os.path.isfile(os.path.join(c, "data_batch_1")):
            return c
    tar = os.path.join(data_path, "cifar-10-python.tar.gz")
    if os.path.isfile(tar):
        with tarfile.open(tar) as tf:
            tf.extractall(data_path, filter="data")
        return os.path.join(data_path, "cifar-10-batches-py")
    raise FileNotFoundError(
        f"CIFAR-10 not found under {data_path!r} (expected cifar-10-batches-py/"
        " or cifar-10-python.tar.gz; this environment cannot download)"
    )


def _load_batch(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    images = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = np.asarray(d[b"labels"], np.int32)
    return images, labels


def load_cifar10_arrays(data_path: str):
    """Returns ``(train_images, train_labels, test_images, test_labels)`` in [-1, 1] NHWC."""
    root = _find_batches_dir(data_path)
    train = [_load_batch(os.path.join(root, f"data_batch_{i}")) for i in range(1, 6)]
    xs = np.concatenate([b[0] for b in train])
    ys = np.concatenate([b[1] for b in train])
    xt, yt = _load_batch(os.path.join(root, "test_batch"))

    def norm(a):
        return (a.astype(np.float32) / 255.0 - 0.5) / 0.5

    return norm(xs), ys, norm(xt), yt


class CIFAR10DataLoader:
    """Surface parity with the reference loader (`dataset/cifar.py:11-58`)."""

    def __init__(
        self,
        data_path: str,
        batch_size: int,
        num_workers: int = 0,  # accepted for config parity; loaders are in-memory
        *,
        seed: int = 0,
    ):
        del num_workers
        xs, ys, xt, yt = load_cifar10_arrays(data_path)
        self._train = ArrayDataLoader(xs, ys, batch_size, shuffle=True, seed=seed)
        self._test = ArrayDataLoader(xt, yt, batch_size, shuffle=False, seed=seed)

    def get_train_loader(self):
        return self._train

    def get_test_loader(self):
        return self._test
