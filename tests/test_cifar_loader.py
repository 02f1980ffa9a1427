"""CIFAR-10 pickle-batch loader unit tests (synthetic batch files).

The reference wraps torchvision's CIFAR10 (`dataset/cifar.py:11-58`); this
framework reads the standard ``cifar-10-batches-py`` pickles directly. These
tests write tiny batch files in the exact on-disk format (uint8 ``data`` rows
of 3072 = 3x32x32 channel-major bytes, byte-keyed dict) and assert layout,
normalization, split sizes, and the batch contract row-by-row.
"""

import os
import pickle
import tarfile

import numpy as np
import pytest

from diffusion_classifier_tpu.data.cifar import (
    CIFAR10_CLASSES,
    CIFAR10DataLoader,
    load_cifar10_arrays,
)

N_PER_BATCH = 8


def _write_batch(path, seed):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, (N_PER_BATCH, 3072), dtype=np.uint8)
    labels = list(rng.integers(0, 10, N_PER_BATCH))
    with open(path, "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    return data, labels


@pytest.fixture
def fake_cifar(tmp_path):
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    train = [
        _write_batch(root / f"data_batch_{i}", seed=i) for i in range(1, 6)
    ]
    test = _write_batch(root / "test_batch", seed=99)
    return str(tmp_path), train, test


def test_load_arrays_layout_and_normalization(fake_cifar):
    path, train, test = fake_cifar
    xs, ys, xt, yt = load_cifar10_arrays(path)
    assert xs.shape == (5 * N_PER_BATCH, 32, 32, 3) and xs.dtype == np.float32
    assert xt.shape == (N_PER_BATCH, 32, 32, 3)
    assert ys.dtype == np.int32 and len(ys) == 5 * N_PER_BATCH

    # row 0 of batch 1: bytes are channel-major [3, 32, 32] -> NHWC, and the
    # reference normalization is (x/255 - 0.5)/0.5 (`dataset/cifar.py:24-27`)
    raw0 = train[0][0][0].reshape(3, 32, 32).transpose(1, 2, 0)
    np.testing.assert_allclose(
        xs[0], (raw0.astype(np.float32) / 255.0 - 0.5) / 0.5, atol=1e-7
    )
    assert xs.min() >= -1.0 and xs.max() <= 1.0
    assert ys[:N_PER_BATCH].tolist() == train[0][1]
    assert yt.tolist() == test[1]


def test_loader_batch_contract(fake_cifar):
    path, _, test = fake_cifar
    dl = CIFAR10DataLoader(path, batch_size=4, seed=0)
    batch = next(iter(dl.get_test_loader()))
    assert set(batch) == {"images", "prompt"}
    assert batch["images"].shape == (4, 32, 32, 3)
    assert batch["images"].dtype == np.float32
    assert batch["prompt"].dtype == np.int32
    # test loader is unshuffled: first rows in file order
    assert batch["prompt"].tolist() == list(test[1][:4])
    assert len(CIFAR10_CLASSES) == 10


def test_finds_tarball(fake_cifar, tmp_path):
    """A cifar-10-python.tar.gz is extracted when the directory is absent."""
    path, _, _ = fake_cifar
    other = tmp_path / "tar_only"
    other.mkdir()
    with tarfile.open(other / "cifar-10-python.tar.gz", "w:gz") as tf:
        tf.add(
            os.path.join(path, "cifar-10-batches-py"),
            arcname="cifar-10-batches-py",
        )
    xs, ys, xt, yt = load_cifar10_arrays(str(other))
    assert xs.shape == (5 * N_PER_BATCH, 32, 32, 3)


def test_missing_data_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="cannot download"):
        load_cifar10_arrays(str(tmp_path / "nope"))
