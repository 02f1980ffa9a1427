"""PadChest OOD pipeline (reference `dataset/padchest.py` parity).

Reproduced semantics (`dataset/padchest.py:10-127`): CSV with image paths and
a binary effusion label; balance; 64×64 resize; 16-bit PNGs scaled by
``255·255`` (the reference's deliberate `image /= 255*255` at `:84`);
grayscale replicated to 3 channels (`:90`); single loader.
"""

from __future__ import annotations

import os

import numpy as np

from .loader import MapDataLoader, Prefetcher

__all__ = ["PadChestDataset", "PadChestDataLoader"]


class PadChestDataset:
    def __init__(
        self,
        data_path: str,
        wavelet_transform: bool = False,
        image_size: int = 64,
        csv_name: str = "padchest_metadata.csv",
        path_col: str = "ImageID",
        label_col: str = "Pleural Effusion",
    ):
        import pandas as pd

        self.data_path = data_path
        self.wavelet_transform = wavelet_transform
        self.image_size = image_size

        df = pd.read_csv(os.path.join(data_path, csv_name))
        df = df[[path_col, label_col]].copy()
        df[label_col] = df[label_col].fillna(0)
        df = df[df[label_col] != -1]
        zeros = df[df[label_col] == 0]
        ones = df[df[label_col] == 1]
        n = min(len(zeros), len(ones))
        frame = pd.concat([zeros.head(n), ones.head(n)])
        self.paths = frame[path_col].tolist()
        self.labels = frame[label_col].astype(int).to_numpy()
        print(f"Dataset length: {len(self.paths)}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        from PIL import Image

        img = Image.open(os.path.join(self.data_path, self.paths[idx]))
        img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        arr = np.asarray(img, np.float32)
        # 16-bit PNG normalization (reference `:84`)
        arr = arr / (255.0 * 255.0)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)  # grayscale → 3ch (`:90`)
        return arr, int(self.labels[idx])


class PadChestDataLoader:
    def __init__(
        self,
        wavelet_transform: bool,
        data_path: str,
        batch_size: int = 64,
        num_workers: int = 4,
        *,
        image_size: int = 64,
        seed: int = 0,
    ):
        del num_workers
        ds = PadChestDataset(data_path, wavelet_transform, image_size)
        self.dataset = ds
        loader = MapDataLoader(
            len(ds), lambda i: ds[i], batch_size, shuffle=True, seed=seed
        )
        self.data_loader = Prefetcher(loader)

    def get_data_loader(self):
        return self.data_loader
