"""ISIC melanoma pipeline (reference `dataset/isic.py` parity).

Reproduced semantics (`dataset/isic.py:9-144`): pre-balanced
``train_balanced.csv`` with ``image_name``/``target`` columns; splits by row
order 80/10/10 like CheXpert; items ``images/<name>.jpg`` → RGB → 256² →
[-1, 1]. ``cf_label`` forces every prompt and passes the true labels through
as ``original_labels`` (`:126-134`) for counterfactual evaluation. The
reference's commented one-off dataset-prep scripts (`:146-185`) are
intentionally not reproduced.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .loader import (
    Prefetcher,
    _process_slice,
    decode_image,
    iter_item_batches,
)

__all__ = ["ISICDataset", "ISICDataLoader"]


class ISICDataset:
    def __init__(
        self,
        data_path: str,
        split: str = "train",
        wavelet_transform: bool = False,
        image_size: int = 256,
        fast_decode: bool = False,
    ):
        import pandas as pd

        self.wavelet_transform = wavelet_transform
        self.data_path = data_path
        self.image_size = image_size
        self.fast_decode = fast_decode
        df = pd.read_csv(os.path.join(data_path, "train_balanced.csv"))
        n = len(df)
        if split == "train":
            df = df.head(int(n * 0.8))
        elif split == "valid":
            df = df.tail(int(n * 0.2)).head(int(n * 0.2) // 2)
        elif split == "test":
            # tail(int(tail_n * 0.5)): odd 20%-tails drop the middle row,
            # exactly like the reference (`dataset/isic.py:39-40`)
            df = df.tail(int(n * 0.2)).tail(int(n * 0.2) // 2)
        else:
            raise ValueError(f"unknown split {split!r}")
        self.names = df["image_name"].tolist()
        self.labels = df["target"].astype(int).to_numpy()
        print(f"Dataset length: {len(self.names)}")

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int):
        path = os.path.join(self.data_path, "images", f"{self.names[idx]}.jpg")
        img = decode_image(path, self.image_size, fast=self.fast_decode)
        arr = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
        return arr, int(self.labels[idx])


class _ISICBatcher:
    """Batches with cf_label override + original_labels passthrough.

    ``batch_size`` is GLOBAL (loader.py contract): under multiple processes
    each host decodes and yields only its contiguous per-rank slice.
    """

    def __init__(
        self, dataset, batch_size, shuffle, seed, cf_label,
        num_workers=0, process_index=None, process_count=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.cf_label = cf_label
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)
        self._proc = (process_index, process_count)

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        rows = _process_slice(self.batch_size, *self._proc)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        # decode only this process's slice of each global batch
        idx_batches = (
            order[i * self.batch_size : (i + 1) * self.batch_size][rows]
            for i in range(len(self))
        )
        for items in iter_item_batches(
            idx_batches, self.dataset.__getitem__, self.num_workers
        ):
            images = np.stack([im for im, _ in items]).astype(np.float32)
            labels = np.asarray([lb for _, lb in items], np.int32)
            batch = {"images": images, "prompt": labels}
            if self.cf_label is not None:
                batch["original_labels"] = labels
                batch["prompt"] = np.full_like(labels, self.cf_label)
            yield batch


class ISICDataLoader:
    def __init__(
        self,
        wavelet_transform: bool,
        data_path: str,
        cf_label: Optional[int] = None,
        batch_size: int = 64,
        num_workers: int = 4,
        *,
        image_size: int = 256,
        seed: int = 0,
        fast_decode: bool = False,
    ):
        def make(split, shuffle):
            ds = ISICDataset(
                data_path, split, wavelet_transform, image_size,
                fast_decode=fast_decode,
            )
            return ds, Prefetcher(
                _ISICBatcher(
                    ds, batch_size, shuffle, seed, cf_label,
                    num_workers=num_workers,
                )
            )

        self.train_dataset, self.train_loader = make("train", True)
        self.val_dataset, self.val_loader = make("valid", False)
        self.test_dataset, self.test_loader = make("test", False)

    def get_train_loader(self):
        return self.train_loader

    def get_val_loader(self):
        return self.val_loader

    def get_test_loader(self):
        return self.test_loader
