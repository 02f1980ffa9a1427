"""PadChest OOD pipeline (reference `dataset/padchest.py` parity).

Reproduced semantics (`dataset/padchest.py:10-127`): ``padchest-v1.csv``
with image paths and the binary ``PleuralEffusion`` label (null → 0, drop
-1, NO balancing — `:45-59`); bare-PIL 64×64 resize (bicubic, PIL's
``Image.resize`` default — `:74`); 16-bit PNGs scaled by ``255·255`` (the
reference's deliberate `image /= 255*255` at `:84`) then normalized to
[-1, 1] (`:87`); grayscale replicated to 3 channels (`:90`); single loader.
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
        csv_name: str = "padchest-v1.csv",
        path_col: str = "ImageID",
        label_col: str = "PleuralEffusion",
    ):
        import pandas as pd

        self.data_path = data_path
        self.wavelet_transform = wavelet_transform
        self.image_size = image_size

        # null → 0, drop -1; the reference does NOT balance (`:45-59`)
        df = pd.read_csv(os.path.join(data_path, csv_name))
        df = df[[path_col, label_col]].copy()
        df[label_col] = df[label_col].fillna(0)
        df = df[df[label_col] != -1]
        self.paths = df[path_col].tolist()
        self.labels = df[label_col].astype(int).to_numpy()
        print(f"Dataset length: {len(self.paths)}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        from PIL import Image

        img = Image.open(os.path.join(self.data_path, self.paths[idx]))
        # bare-PIL resize: default resample is bicubic (reference `:74`)
        img = img.resize((self.image_size, self.image_size))
        arr = np.asarray(img, np.float32)
        # 16-bit PNG normalization (reference `:84`) then [-1, 1] (`:87`)
        arr = arr / (255.0 * 255.0)
        arr = (arr - 0.5) / 0.5
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
        ds = PadChestDataset(data_path, wavelet_transform, image_size)
        self.dataset = ds
        loader = MapDataLoader(
            len(ds), lambda i: ds[i], batch_size, shuffle=True, seed=seed,
            num_workers=num_workers,
        )
        self.data_loader = Prefetcher(loader)

    def get_data_loader(self):
        return self.data_loader
