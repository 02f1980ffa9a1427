"""Decoded-sample cache unit tests (VERDICT r4 next-round §3).

The cache must be transparent (bit-identical items), hit without touching
libjpeg, and invalidate on source mtime/size changes — the same contract as
the reference's per-sample decoded cache for IPMSA volumes
(`/root/reference/dataset/ipmsa.py:174-197`), applied to the JPEG pipelines.
"""

import csv
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from diffusion_classifier_tpu.data import loader as loader_mod
from diffusion_classifier_tpu.data.decode_cache import DecodeCache


@pytest.fixture()
def jpg(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "img.jpg")
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(arr, "RGB").save(p, quality=95)
    return p


def _counting_decode(monkeypatch):
    calls = {"n": 0}
    real = loader_mod.decode_image

    def wrapper(path, image_size, *, fast=False):
        calls["n"] += 1
        return real(path, image_size, fast=fast)

    monkeypatch.setattr(loader_mod, "decode_image", wrapper)
    # chexpert.py binds decode_image at import; patch that name too so the
    # uncached dataset path is counted as well
    from diffusion_classifier_tpu.data import chexpert as chex_mod

    monkeypatch.setattr(chex_mod, "decode_image", wrapper)
    return calls


def test_cache_content_parity_and_hit(tmp_path, jpg, monkeypatch):
    calls = _counting_decode(monkeypatch)
    cache = DecodeCache(str(tmp_path / "cache"), size=16)

    direct = np.asarray(loader_mod.decode_image(jpg, 16), np.uint8)
    calls["n"] = 0

    first = cache.get_or_decode(jpg)
    assert calls["n"] == 1
    np.testing.assert_array_equal(first, direct)
    assert first.dtype == np.uint8 and first.shape == (16, 16, 3)

    second = cache.get_or_decode(jpg)
    assert calls["n"] == 1  # HIT: no decode
    np.testing.assert_array_equal(second, first)

    # a second cache instance over the same dir also hits (disk, not memory)
    cache2 = DecodeCache(str(tmp_path / "cache"), size=16)
    third = cache2.get_or_decode(jpg)
    assert calls["n"] == 1
    np.testing.assert_array_equal(third, first)


def test_cache_invalidates_on_mtime_and_content_change(
    tmp_path, jpg, monkeypatch
):
    calls = _counting_decode(monkeypatch)
    cache = DecodeCache(str(tmp_path / "cache"), size=16)
    cache.get_or_decode(jpg)
    assert calls["n"] == 1

    # touched source (same bytes, new mtime) → fresh key → re-decode
    st = os.stat(jpg)
    os.utime(jpg, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    cache.get_or_decode(jpg)
    assert calls["n"] == 2

    # replaced source (different pixels/size) → re-decode, new content served
    arr = np.full((32, 32, 3), 200, np.uint8)
    Image.fromarray(arr, "RGB").save(jpg, quality=95)
    out = cache.get_or_decode(jpg)
    assert calls["n"] == 3
    assert abs(int(out.mean()) - 200) < 8  # JPEG-lossy tolerance


def test_cache_key_separates_size_and_fast(tmp_path, jpg, monkeypatch):
    calls = _counting_decode(monkeypatch)
    c16 = DecodeCache(str(tmp_path / "cache"), size=16)
    c8 = DecodeCache(str(tmp_path / "cache"), size=8)
    c16f = DecodeCache(str(tmp_path / "cache"), size=16, fast=True)

    a = c16.get_or_decode(jpg)
    b = c8.get_or_decode(jpg)
    c = c16f.get_or_decode(jpg)
    assert calls["n"] == 3  # three distinct entries in the shared dir
    assert a.shape == (16, 16, 3) and b.shape == (8, 8, 3)
    assert c.shape == (16, 16, 3)
    # each re-read hits its own entry
    c16.get_or_decode(jpg), c8.get_or_decode(jpg), c16f.get_or_decode(jpg)
    assert calls["n"] == 3


def test_chexpert_dataset_cache_is_transparent(tmp_path, monkeypatch):
    """CheXpertDataset(decode_cache_dir=...) yields bit-identical items to
    the uncached dataset, on both the populate and the hit epoch."""
    from diffusion_classifier_tpu.data.chexpert import CheXpertDataset

    root = tmp_path / "chexpert"
    root.mkdir()
    rng = np.random.default_rng(1)
    rows = []
    for i, lab in enumerate([1.0, 0.0, 1.0, 0.0]):
        tag = f"p{i:02d}/study1/view1_frontal.jpg"
        rows.append((f"CheXpert-v1.0-small/{tag}", lab, 1.0 - lab))
        full = root / tag
        os.makedirs(full.parent, exist_ok=True)
        arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(str(full), quality=95)
    with open(root / "train.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Path", "Pleural Effusion", "No Finding"])
        w.writerows(rows)

    plain = CheXpertDataset(str(root), "train", image_size=16)
    cached = CheXpertDataset(
        str(root), "train", image_size=16,
        decode_cache_dir=str(tmp_path / "cache"),
    )
    calls = _counting_decode(monkeypatch)
    for epoch in range(2):
        for i in range(len(plain)):
            img_p, lab_p = plain[i]
            img_c, lab_c = cached[i]
            np.testing.assert_array_equal(img_c, img_p)
            assert lab_c == lab_p
            assert img_c.dtype == np.float32
    # epoch 2 of the cached dataset decoded nothing; plain re-decoded all
    assert calls["n"] == 2 * len(plain) * 2 - len(plain)
