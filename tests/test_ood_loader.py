"""The OOD dataset switch (`data/ood.py`) over synthetic rows.

Round-2 verdict item 6: ISIC and PadChest were reachable only from unit
tests; now every OOD dataset drives the chexpert ``ood.py`` CLIs through
``make_ood_loader``. These tests run the selection layer over tiny synthetic
CSV/image trees (same schemas as `tests/test_data_csv.py`) and check the
uniform batch contract each engine path assumes.
"""

import csv
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from diffusion_classifier_tpu.data.ood import OOD_DATASETS, make_ood_loader
from diffusion_classifier_tpu.utils.config import ExperimentConfig


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _png(path, value=128, size=(8, 8), mode="RGB"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if mode == "I;16":
        Image.fromarray(np.full(size, value, np.uint16), mode="I;16").save(path)
    else:
        Image.fromarray(np.full(size + (3,), value, np.uint8), "RGB").save(path)


def _mimic_dir(tmp_path):
    root = tmp_path / "mimic"
    root.mkdir()
    rows = [
        ("files/p1/pa/s1/a.jpg", 0.0),
        ("files/p1/pb/s2/b.jpg", 1.0),
        ("files/p1/pc/s3/c.jpg", 0.0),
        ("files/p1/pd/s4/d.jpg", 1.0),
    ]
    _write_csv(
        root / "mimic_pa_metadata.csv", ["image_path", "Pleural Effusion"], rows
    )
    for p, _ in rows:
        _png(str(root / os.path.join(*p.split("/")[2:])))
    return str(root)


def _padchest_dir(tmp_path):
    root = tmp_path / "padchest"
    root.mkdir()
    rows = [("im0.png", 0.0), ("im1.png", 1.0)]
    _write_csv(
        root / "padchest-v1.csv", ["ImageID", "PleuralEffusion"], rows
    )
    for name, _ in rows:
        _png(str(root / name), value=1000, mode="I;16")
    return str(root)


def _isic_dir(tmp_path):
    root = tmp_path / "isic"
    (root / "images").mkdir(parents=True)
    names = [f"ISIC_{i:07d}" for i in range(10)]
    _write_csv(
        root / "train_balanced.csv",
        ["image_name", "target"],
        [(n, i % 2) for i, n in enumerate(names)],
    )
    for n in names:
        _png(str(root / "images" / f"{n}.jpg"))
    return str(root)


_BUILDERS = {"mimic": _mimic_dir, "padchest": _padchest_dir, "isic": _isic_dir}
# evaluation geometry each dataset keeps (reference loader defaults)
_SIZES = {"mimic": 64, "padchest": 64, "isic": 256}


@pytest.mark.parametrize("name", OOD_DATASETS)
def test_ood_loader_batch_contract(name, tmp_path):
    cfg = ExperimentConfig(
        data_path=_BUILDERS[name](tmp_path),
        batch_size=2 if name != "isic" else 1,
        num_workers=0,
        wavelet_transform=False,
    )
    loader = make_ood_loader(name, cfg)
    batches = list(loader)
    assert batches, f"{name} loader yielded no batches"
    for batch in batches:
        img, prompt = batch["images"], batch["prompt"]
        assert img.dtype == np.float32
        s = _SIZES[name]
        assert img.shape[1:] == (s, s, 3)
        assert img.shape[0] == prompt.shape[0]
        assert set(np.unique(prompt)) <= {0, 1}


def test_ood_loader_synthetic_smoke():
    cfg = ExperimentConfig(
        data_path="synthetic", batch_size=4, image_size=8, image_channels=3
    )
    batch = next(iter(make_ood_loader("mimic", cfg)))
    assert batch["images"].shape == (4, 8, 8, 3)


def test_ood_loader_unknown_name():
    with pytest.raises(ValueError, match="unknown OOD dataset"):
        make_ood_loader("cifar", ExperimentConfig())


def test_ood_cli_dataset_flag_parses():
    """The --dataset flag reaches make_ood_loader in both chexpert CLIs."""
    import importlib
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for family in ("chexpert-unet", "chexpert-dit"):
        exp_dir = os.path.join(repo, "experiments", family)
        sys.path.insert(0, exp_dir)
        for m in ("common", "ood"):
            sys.modules.pop(m, None)
        try:
            mod = importlib.import_module("ood")
            assert mod.OOD_DATASETS == OOD_DATASETS
        finally:
            sys.path.remove(exp_dir)
            for m in ("common", "ood"):
                sys.modules.pop(m, None)
