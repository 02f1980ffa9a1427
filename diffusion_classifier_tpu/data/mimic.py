"""MIMIC-CXR OOD evaluation pipeline (reference `dataset/mimic.py` parity).

Semantics reproduced exactly (`dataset/mimic.py:9-122`): CSV
``mimic_pa_metadata.csv``; keep ``image_path`` + ``Pleural Effusion``; nulls
→ 0; drop −1; balance by taking the FIRST ``min_count`` rows per label (the
reference uses ``limit``, not sampling, `:60-67`); single shuffled loader, no
splits. Items are resized to 64×64 and NOT normalized — they stay in [0, 1]
(the reference's Normalize is commented out, `:41`); this quirk is intentional
OOD stress and is preserved.
"""

from __future__ import annotations

import os

import numpy as np

from .loader import MapDataLoader, Prefetcher, decode_image

__all__ = ["MimicOodDataset", "MimicOodDataLoader", "mimicOodDataLoader"]


class MimicOodDataset:
    def __init__(
        self,
        data_path: str,
        wavelet_transform: bool = False,
        image_size: int = 64,
        fast_decode: bool = False,
    ):
        import pandas as pd

        self.wavelet_transform = wavelet_transform
        self.data_path = data_path
        self.image_size = image_size
        self.fast_decode = fast_decode

        df = pd.read_csv(os.path.join(data_path, "mimic_pa_metadata.csv"))
        df = df[["image_path", "Pleural Effusion"]].copy()
        df["Pleural Effusion"] = df["Pleural Effusion"].fillna(0)
        df = df[df["Pleural Effusion"] != -1]
        zeros = df[df["Pleural Effusion"] == 0]
        ones = df[df["Pleural Effusion"] == 1]
        min_count = min(len(zeros), len(ones))
        frame = pd.concat([zeros.head(min_count), ones.head(min_count)])
        self.paths = frame["image_path"].tolist()
        self.labels = frame["Pleural Effusion"].astype(int).to_numpy()
        print(f"Dataset length: {len(self.paths)}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        rel = os.path.join(*self.paths[idx].split("/")[2:])
        img = decode_image(
            os.path.join(self.data_path, rel),
            self.image_size,
            fast=self.fast_decode,
        )
        arr = np.asarray(img, np.float32) / 255.0  # stays in [0, 1] (`:41`)
        return arr, int(self.labels[idx])


class MimicOodDataLoader:
    def __init__(
        self,
        wavelet_transform: bool,
        data_path: str,
        batch_size: int = 64,
        num_workers: int = 4,
        *,
        image_size: int = 64,
        seed: int = 0,
        fast_decode: bool = False,
    ):
        ds = MimicOodDataset(
            data_path, wavelet_transform, image_size, fast_decode=fast_decode
        )
        self.dataset = ds
        loader = MapDataLoader(
            len(ds), lambda i: ds[i], batch_size, shuffle=True, seed=seed,
            num_workers=num_workers,
        )
        self.data_loader = Prefetcher(loader)

    def get_data_loader(self):
        return self.data_loader


# reference spelling (`dataset/mimic.py:92`)
mimicOodDataLoader = MimicOodDataLoader
