"""CheXpert binary healthy/sick pipeline (reference `dataset/chexpert.py` parity).

Filter semantics reproduced exactly (`dataset/chexpert.py:58-127`):

- rows whose ``Path`` contains ``study1/view1_frontal.jpg``;
- keep ``Pleural Effusion`` / ``No Finding``, nulls → 0, drop −1 (uncertain);
- keep rows where exactly one of (effusion>0, no-finding>0) holds (XOR);
- class-balance by sampling ``min_count`` per label with seed 42, then
  shuffle with seed 42;
- splits by row order: train = first 80%, valid = first half of last 20%,
  test = second half (`:31-40`).

Items: PIL open → RGB → resize 256² → [-1, 1] (Normalize 0.5/0.5, `:51-56`),
NHWC float32. ``cf_label`` overrides every label at collate for counterfactual
generation (`:198-200`).

Differences from the reference (TPU-native): CSV handling uses pandas (polars
is not in this image — it was missing from the reference's requirements too,
SURVEY §2.5), and the Haar DWT is NOT applied per-item on the host; the engine
applies it in-graph when ``wavelet_transform`` is set (`ops/wavelet.py`).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .loader import MapDataLoader, Prefetcher, decode_image

__all__ = ["CheXpertDataset", "CheXpertDataLoader"]


def _load_frame(csv_path: str):
    import pandas as pd

    df = pd.read_csv(csv_path)
    df = df[df["Path"].str.contains("study1/view1_frontal.jpg", regex=False)]
    df = df[["Path", "Pleural Effusion", "No Finding"]].copy()
    df["Pleural Effusion"] = df["Pleural Effusion"].fillna(0)
    df["No Finding"] = df["No Finding"].fillna(0)
    df = df[(df["Pleural Effusion"] != -1) & (df["No Finding"] != -1)]
    xor = (df["Pleural Effusion"] > 0) ^ (df["No Finding"] > 0)
    df = df[xor]

    active = df[df["Pleural Effusion"] == 1]
    inactive = df[df["Pleural Effusion"] == 0]
    min_count = min(len(active), len(inactive))
    active = active.sample(n=min_count, replace=False, random_state=42)
    inactive = inactive.sample(n=min_count, replace=False, random_state=42)
    df = pd.concat([active, inactive])
    df = df.sample(n=len(df), random_state=42)  # shuffle
    return df.reset_index(drop=True)


class CheXpertDataset:
    # class-level default: off unless __init__ builds one (tests construct
    # partial instances via __new__)
    _decode_cache = None

    def __init__(
        self,
        data_path: str,
        split: str = "train",
        wavelet_transform: bool = False,
        image_size: int = 256,
        fast_decode: bool = False,
        decode_cache_dir: Optional[str] = None,
    ):
        # wavelet_transform recorded for parity; applied in-graph by the engine
        self.wavelet_transform = wavelet_transform
        self.data_path = data_path
        self.image_size = image_size
        self.fast_decode = fast_decode
        # decoded-sample cache (reference ipmsa.py:174-197 lever, applied to
        # JPEG): epoch 1 decodes + stores uint8, later epochs stream from disk
        if decode_cache_dir:
            from .decode_cache import DecodeCache

            self._decode_cache = DecodeCache(
                decode_cache_dir, image_size, fast=fast_decode
            )
        else:
            self._decode_cache = None
        df = _load_frame(os.path.join(data_path, "train.csv"))
        n = len(df)
        if split == "train":
            df = df.head(int(n * 0.8))
        elif split == "valid":
            df = df.tail(int(n * 0.2)).head(int(n * 0.2) // 2)
        elif split == "test":
            # tail(int(tail_n * 0.5)) — when the 20% tail has odd length the
            # reference drops the middle row entirely (`:38-40`)
            df = df.tail(int(n * 0.2)).tail(int(n * 0.2) // 2)
        else:
            raise ValueError(f"unknown split {split!r}")
        self.paths = df["Path"].tolist()
        self.labels = df["Pleural Effusion"].astype(int).to_numpy()
        print(f"Dataset length: {len(self.paths)}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        rel = os.path.join(*self.paths[idx].split("/")[1:])
        full = os.path.join(self.data_path, rel)
        if self._decode_cache is not None:
            arr = self._decode_cache.get_or_decode(full).astype(np.float32)
            arr /= 255.0
            arr = (arr - 0.5) / 0.5  # [-1, 1], NHWC
            return arr, int(self.labels[idx])
        img = decode_image(full, self.image_size, fast=self.fast_decode)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - 0.5) / 0.5  # [-1, 1], NHWC
        return arr, int(self.labels[idx])

    def mistake_paths(self, predictions) -> list[str]:
        """Relative paths of misclassified items — the `mistakes/*.txt` format."""
        rels = [os.path.join(*p.split("/")[1:]) for p in self.paths]
        return [
            rels[i]
            for i, pred in enumerate(predictions)
            if int(pred) != int(self.labels[i])
        ]


class CheXpertDataLoader:
    """Surface parity with `dataset/chexpert.py:151-215`."""

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
        decode_cache_dir: Optional[str] = None,
    ):
        self.cf_label = cf_label

        def make(split, shuffle):
            ds = CheXpertDataset(
                data_path, split, wavelet_transform, image_size,
                fast_decode=fast_decode,
                decode_cache_dir=decode_cache_dir,
            )

            def load(i):
                img, label = ds[i]
                if cf_label is not None:
                    label = cf_label
                return img, label

            loader = MapDataLoader(
                len(ds), load, batch_size, shuffle=shuffle, seed=seed,
                num_workers=num_workers,
            )
            return ds, Prefetcher(loader)

        self.train_dataset, self.train_loader = make("train", True)
        self.val_dataset, self.val_loader = make("valid", False)
        self.test_dataset, self.test_loader = make("test", False)

    def get_train_loader(self):
        return self.train_loader

    def get_val_loader(self):
        return self.val_loader

    def get_test_loader(self):
        return self.test_loader
