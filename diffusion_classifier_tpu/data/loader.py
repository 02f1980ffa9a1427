"""Minimal host-side batch loaders feeding the TPU input pipeline.

Replaces the reference's torch ``DataLoader`` worker processes
(`dataset/cifar.py:20-45` et al.) with a simple epoch-shuffled batching
iterator over in-memory numpy arrays plus an optional background-thread
prefetcher for pipelines with per-item decode cost. Batch contract matches
the reference exactly: ``{"images": [B,H,W,C] float32, "prompt": [B] int32}``
(NHWC here — TPU-native layout — vs the reference's NCHW).

``drop_last`` is always true: static shapes are a requirement for compiled
TPU steps (SURVEY §7 "fixed shapes").

Multi-host: ``batch_size`` is always the GLOBAL batch size. Under more than
one process, every process computes the same epoch shuffle (loaders must be
constructed with the same seed on all hosts — they are, from
``config.seed``) and yields only its contiguous per-rank slice of each
global batch — the reference's DDP per-rank sharding
(``accelerate.prepare``, `diffusion/diffusion_classifier.py:382`).
``parallel.mesh.shard_batch`` reassembles the global array from the local
slices.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Sequence

import numpy as np

__all__ = [
    "ArrayDataLoader",
    "MapDataLoader",
    "Prefetcher",
    "decode_image",
    "iter_item_batches",
]


def decode_image(path: str, image_size: int, *, fast: bool = False):
    """Open → (optional reduced-scale JPEG decode) → RGB → bilinear resize.

    The shared decode core of the JPEG-sourced datasets (CheXpert/MIMIC/
    ISIC — reference transform stacks `dataset/{chexpert,mimic,isic}.py`).
    With ``fast=True``, PIL's draft mode asks libjpeg to decode at the
    smallest DCT-domain scale (1/1…1/8) still ≥ the target, and the bilinear
    resize finishes the job — 3–8× less IDCT work on large sources (the
    reference's CheXpert scans are ~2800 px, downsampled to 256). Pixel
    differences vs the full decode are at resampling-noise level (tested);
    non-JPEG formats ignore draft and decode identically. Returns a PIL
    image of size ``image_size²`` in RGB.
    """
    from PIL import Image

    img = Image.open(path)
    if fast:
        img.draft(None, (image_size, image_size))
    img = img.convert("RGB")
    return img.resize((image_size, image_size), Image.BILINEAR)


def iter_item_batches(
    index_batches: Iterable[Sequence[int]],
    load_fn: Callable[[int], object],
    num_workers: int = 0,
    window: int = 3,
) -> Iterator[list]:
    """Decode index batches into item lists, optionally with a thread pool.

    The multi-worker equivalent of the reference's torch DataLoader worker
    processes (`dataset/chexpert.py:152,169`, `dataset/cifar.py:40`,
    `dataset/ipmsa.py:579`), built as a THREAD pool: the hot decode paths
    (PIL JPEG decode/resize, numpy transforms, the C lz4 decoder) all release
    the GIL, so threads scale without the serialization cost of process
    workers. ``num_workers <= 0`` decodes serially on the calling thread
    (torch's ``num_workers=0`` semantics).

    Item futures for up to ``window`` batches are kept in flight so workers
    never drain at a batch boundary; batches are yielded strictly in order,
    so output is bit-identical to the serial path for any worker count. A
    decode exception re-raises on the consuming thread at its batch's
    position. ``load_fn`` must be thread-safe (the dataset decode fns here
    are: pure reads + per-call PIL/numpy objects).
    """
    if num_workers <= 0:
        for idx in index_batches:
            yield [load_fn(int(j)) for j in idx]
        return
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
        it = iter(index_batches)
        pending: deque = deque()

        def submit_next() -> None:
            idx = next(it, None)
            if idx is not None:
                pending.append([pool.submit(load_fn, int(j)) for j in idx])

        for _ in range(max(window, 1)):
            submit_next()
        while pending:
            futs = pending.popleft()
            submit_next()  # refill before blocking: keeps the pool busy
            yield [f.result() for f in futs]
    finally:
        # cancel_futures: an early-abandoning consumer (eval stop_idx) must
        # not decode the rest of the window before the pool can close
        pool.shutdown(wait=True, cancel_futures=True)


def _process_slice(
    batch_size: int, process_index: Optional[int], process_count: Optional[int]
) -> slice:
    """This process's contiguous row slice of a global batch."""
    assert (process_index is None) == (process_count is None), (
        "pass BOTH process_index and process_count, or neither "
        "(neither = take them from the jax runtime)"
    )
    if process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    assert batch_size % process_count == 0, (
        f"global batch {batch_size} not divisible by {process_count} processes"
    )
    local = batch_size // process_count
    return slice(process_index * local, (process_index + 1) * local)


class ArrayDataLoader:
    """Batches over in-memory arrays; reshuffles every epoch."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        extra: Optional[dict] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        assert len(images) == len(labels)
        self.images = np.asarray(images, np.float32)
        self.labels = np.asarray(labels, np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.extra = extra or {}
        self._rng = np.random.default_rng(seed)
        self._proc = (process_index, process_count)

    def __len__(self) -> int:
        return len(self.images) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        rows = _process_slice(self.batch_size, *self._proc)
        order = np.arange(len(self.images))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(len(self)):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size][rows]
            batch = {"images": self.images[idx], "prompt": self.labels[idx]}
            for k, v in self.extra.items():
                batch[k] = v[idx]
            yield batch


class MapDataLoader:
    """Batches computed per-item via ``load_fn(index) -> (image, label)``.

    For datasets with decode cost (JPEG/PNG/lz4 volumes). ``num_workers > 0``
    decodes items on a thread pool (`iter_item_batches`) — the reference's
    4-process torch DataLoader equivalent (`dataset/chexpert.py:152`); batch
    contents are identical for any worker count. Use with
    :class:`Prefetcher` to additionally overlap host decode with device
    compute.
    """

    def __init__(
        self,
        num_items: int,
        load_fn: Callable[[int], tuple],
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.num_items = num_items
        self.load_fn = load_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)
        self._proc = (process_index, process_count)

    def __len__(self) -> int:
        return self.num_items // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        rows = _process_slice(self.batch_size, *self._proc)
        order = np.arange(self.num_items)
        if self.shuffle:
            self._rng.shuffle(order)
        # decode only this process's slice of each global batch
        idx_batches = (
            order[i * self.batch_size : (i + 1) * self.batch_size][rows]
            for i in range(len(self))
        )
        for items in iter_item_batches(
            idx_batches, self.load_fn, self.num_workers
        ):
            images = np.stack([im for im, _ in items]).astype(np.float32)
            labels = np.asarray([lb for _, lb in items], np.int32)
            yield {"images": images, "prompt": labels}


class Prefetcher:
    """Background-thread prefetch of a loader (double-buffered by default)."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded-queue put that aborts when the consumer is gone:
            # engines break out of eval loops at stop_idx, abandoning the
            # generator — a plain q.put would then block this thread forever
            # and leak its buffered decoded batches, one thread per epoch.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # A decode/IO failure must surface in the consumer, not silently
            # truncate the epoch: ship the exception through the queue and
            # re-raise it on the consuming thread.
            try:
                for batch in self.loader:
                    if not put(batch):
                        return
            except BaseException as e:  # noqa: BLE001 - relayed to consumer
                put(e)
            else:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # unblocks (not joins) the worker: an early-breaking consumer
            # must not wait out an in-flight item decode
            stop.set()
