"""Multi-worker host decode pool (`data/loader.py::iter_item_batches`).

The reference feeds its training loops from 4-process torch DataLoaders
(`/root/reference/dataset/chexpert.py:152,169`, `dataset/cifar.py:40`,
`dataset/ipmsa.py:579`); this repo's equivalent is a GIL-releasing thread
pool behind every per-item loader (VERDICT r3 missing #1). Contract under
test: bit-identical batches for any worker count, ≥2× decode throughput
scaling, exception propagation, and clean early-abandon shutdown.
"""

import threading
import time

import numpy as np
import pytest

from diffusion_classifier_tpu.data.loader import (
    MapDataLoader,
    Prefetcher,
    iter_item_batches,
)


def _dataset(n=64, size=8):
    rng = np.random.default_rng(0)
    images = rng.standard_normal((n, size, size, 3)).astype(np.float32)
    labels = (np.arange(n) % 7).astype(np.int32)

    def load(i):
        return images[i], int(labels[i])

    return images, labels, load


@pytest.mark.parametrize("num_workers", [1, 2, 4])
def test_worker_batches_identical_to_serial(num_workers):
    """Same seed/shuffle ⇒ the pooled loader yields the serial batches."""
    _, _, load = _dataset()
    mk = lambda w: MapDataLoader(  # noqa: E731
        64, load, 16, shuffle=True, seed=3, num_workers=w
    )
    serial = list(mk(0))
    pooled = list(mk(num_workers))
    assert len(serial) == len(pooled) == 4
    for s, p in zip(serial, pooled):
        np.testing.assert_array_equal(s["images"], p["images"])
        np.testing.assert_array_equal(s["prompt"], p["prompt"])


def test_workers_scale_decode_throughput():
    """N workers deliver ≥2× the items/sec of one worker.

    The stand-in decode sleeps (releasing the GIL like PIL/numpy/lz4 do);
    the pool must overlap those sleeps both within and across batches.
    """
    delay = 0.004
    n, bs = 128, 16

    def slow_load(i):
        time.sleep(delay)
        return np.zeros((4, 4, 3), np.float32), 0

    def epoch_sec(workers):
        loader = MapDataLoader(
            n, slow_load, bs, shuffle=False, num_workers=workers
        )
        t0 = time.perf_counter()
        for _ in loader:
            pass
        return time.perf_counter() - t0

    t1 = epoch_sec(1)
    t8 = epoch_sec(8)
    assert t1 / t8 >= 2.0, f"8 workers only {t1 / t8:.2f}x over 1"


def test_decode_exception_propagates_in_order():
    _, _, load = _dataset()

    def bad_load(i):
        if i == 20:
            raise RuntimeError("boom at 20")
        return load(i)

    loader = MapDataLoader(64, bad_load, 16, shuffle=False, num_workers=4)
    it = iter(loader)
    next(it)  # batch 0 (items 0-15) is clean
    with pytest.raises(RuntimeError, match="boom at 20"):
        next(it)  # batch 1 contains item 20


def test_early_abandon_shuts_pool_down():
    """Breaking out mid-epoch must not leave worker threads running."""
    started = threading.Event()

    def load(i):
        started.set()
        time.sleep(0.001)
        return np.zeros((2, 2, 3), np.float32), 0

    before = threading.active_count()
    loader = MapDataLoader(256, load, 16, shuffle=False, num_workers=4)
    for _ in loader:
        break  # abandon after one batch; generator close must cancel the rest
    assert started.is_set()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before


def test_iter_item_batches_orders_and_refills():
    """Items come back grouped per input batch, in submission order."""
    batches = [[0, 1], [2, 3], [4, 5], [6, 7]]
    out = list(iter_item_batches(iter(batches), lambda i: i * 10, 3, window=2))
    assert out == [[0, 10], [20, 30], [40, 50], [60, 70]]


def test_pooled_loader_composes_with_prefetcher():
    """num_workers decode + background prefetch, the production stack."""
    _, _, load = _dataset()
    serial = list(MapDataLoader(64, load, 16, shuffle=True, seed=5))
    stacked = list(
        Prefetcher(
            MapDataLoader(64, load, 16, shuffle=True, seed=5, num_workers=4)
        )
    )
    for s, p in zip(serial, stacked):
        np.testing.assert_array_equal(s["images"], p["images"])
        np.testing.assert_array_equal(s["prompt"], p["prompt"])


class TestFastDecode:
    """Reduced-scale JPEG decode (`data/loader.py::decode_image`, fast=True)."""

    @staticmethod
    def _write_jpeg(path, px):
        from PIL import Image

        rng = np.random.default_rng(0)
        small = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        Image.fromarray(small, "L").resize((px, px), Image.BILINEAR).save(
            path, quality=92
        )

    def test_fast_matches_full_decode_within_noise(self, tmp_path):
        from diffusion_classifier_tpu.data.loader import decode_image

        p = tmp_path / "big.jpg"
        self._write_jpeg(p, 2048)
        slow = np.asarray(decode_image(p, 256), np.float32) / 255.0
        fast = np.asarray(decode_image(p, 256, fast=True), np.float32) / 255.0
        assert slow.shape == fast.shape == (256, 256, 3)
        # DCT-domain downscale + bilinear vs full decode + bilinear: equal up
        # to resampling noise on smooth (radiograph-like) content
        assert np.mean(np.abs(slow - fast)) < 0.02
        assert np.max(np.abs(slow - fast)) < 0.15

    def test_fast_noop_on_png(self, tmp_path):
        from PIL import Image

        from diffusion_classifier_tpu.data.loader import decode_image

        p = tmp_path / "img.png"
        rng = np.random.default_rng(1)
        Image.fromarray(
            rng.integers(0, 256, (300, 300, 3), dtype=np.uint8), "RGB"
        ).save(p)
        slow = np.asarray(decode_image(p, 128))
        fast = np.asarray(decode_image(p, 128, fast=True))
        np.testing.assert_array_equal(slow, fast)  # draft ignores non-JPEG

    def test_fast_decode_is_cheaper_on_large_sources(self, tmp_path):
        from diffusion_classifier_tpu.data.loader import decode_image

        p = tmp_path / "big.jpg"
        self._write_jpeg(p, 2048)
        n = 12

        def run(fast):
            t0 = time.perf_counter()
            for _ in range(n):
                decode_image(p, 256, fast=fast)
            return time.perf_counter() - t0

        run(True), run(False)  # warm page cache both ways
        slow, fast = run(False), run(True)
        assert fast < 0.7 * slow, f"draft decode not cheaper: {fast:.3f} vs {slow:.3f}"

    def test_chexpert_dataset_honors_fast_decode(self, tmp_path, monkeypatch):
        """The flag reaches the dataset decode path (spy on decode_image)."""
        import diffusion_classifier_tpu.data.chexpert as cx

        seen = {}

        def spy(path, size, *, fast=False):
            seen["fast"] = fast
            from PIL import Image

            return Image.new("RGB", (size, size))

        monkeypatch.setattr(cx, "decode_image", spy)
        ds = cx.CheXpertDataset.__new__(cx.CheXpertDataset)
        ds.data_path, ds.image_size, ds.fast_decode = str(tmp_path), 64, True
        ds.paths, ds.labels = ["root/p/study1/view1_frontal.jpg"], np.array([1])
        img, label = ds[0]
        assert seen["fast"] is True and img.shape == (64, 64, 3)
