"""Crash-safety tests for the checkpoint directory swap and the prefetcher.

The reference's checkpointing (`diffusion/diffusion_classifier.py:727-805`)
relies on Accelerate and has no crash-window story; here saves go through a
two-rename directory swap (`utils/checkpoint.py:_atomic_save`) whose every
interruption point must still leave a loadable checkpoint
(`_resolve_state_dir`). These tests simulate each crash window by arranging
the directory layout the crash would leave behind.
"""

import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.data.loader import MapDataLoader, Prefetcher
from diffusion_classifier_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


def _state(value: float):
    return {"w": jnp.full((4,), value, jnp.float32), "step": jnp.int32(7)}


def _abstract():
    return _state(0.0)


def _assert_loads(path, expected_value, expected_epoch):
    state, epoch, best, key = load_checkpoint(path, _abstract())
    np.testing.assert_allclose(np.asarray(state["w"]), expected_value)
    assert epoch == expected_epoch


def _mark_complete(tmp_dir):
    """Write the sentinel `_atomic_save` leaves after wait_until_finished —
    the crash layouts below happen AFTER the write completed."""
    with open(tmp_dir + ".complete", "w") as f:
        f.write("complete")


def test_save_load_roundtrip(tmp_path):
    exp = str(tmp_path)
    save_checkpoint(exp, _state(1.0), epoch=3, best_metric=0.5, best=True)
    _assert_loads(os.path.join(exp, "checkpoints"), 1.0, 4)
    _assert_loads(os.path.join(exp, "best_checkpoint"), 1.0, 4)


def test_recovers_from_crash_between_renames(tmp_path):
    """Crash after `state` -> `state.old` but before `state.new` -> `state`:
    both a complete .new and the previous .old exist, no `state`. Restore
    must prefer the newer `.new`."""
    exp = str(tmp_path)
    save_checkpoint(exp, _state(1.0), epoch=1)
    ckpt = os.path.join(exp, "checkpoints")
    # Second save, then rewind its final rename: state -> state.new, and
    # resurrect the first save as state.old.
    save_checkpoint(exp, _state(2.0), epoch=2)
    final = os.path.join(ckpt, "state")
    os.rename(final, final + ".new")
    _mark_complete(final + ".new")
    save_dir_v1 = os.path.join(str(tmp_path), "v1")
    save_checkpoint(save_dir_v1, _state(1.0), epoch=1)
    shutil.copytree(os.path.join(save_dir_v1, "checkpoints", "state"), final + ".old")
    _assert_loads(ckpt, 2.0, 3)


def test_recovers_from_old_only(tmp_path):
    """Crash just after `state` -> `state.old` with `.new` also lost (e.g.
    torn write cleaned up manually): the previous checkpoint still loads."""
    exp = str(tmp_path)
    save_checkpoint(exp, _state(1.0), epoch=1)
    ckpt = os.path.join(exp, "checkpoints")
    final = os.path.join(ckpt, "state")
    os.rename(final, final + ".old")
    _assert_loads(ckpt, 1.0, 2)


def test_stale_leftovers_cleaned_on_next_save(tmp_path):
    """A non-empty leftover `.old`/`.new` from an earlier crash must not make
    the next save's renames raise (the round-1 advisor finding)."""
    exp = str(tmp_path)
    save_checkpoint(exp, _state(1.0), epoch=1)
    ckpt = os.path.join(exp, "checkpoints")
    final = os.path.join(ckpt, "state")
    shutil.copytree(final, final + ".old")
    shutil.copytree(final, final + ".new")
    save_checkpoint(exp, _state(3.0), epoch=5)  # must not raise
    _assert_loads(ckpt, 3.0, 6)
    assert not os.path.exists(final + ".old")
    assert not os.path.exists(final + ".new")


def test_prefetcher_propagates_worker_errors():
    """A decode failure mid-epoch must raise in the consumer, not silently
    truncate the epoch (the round-1 advisor finding)."""

    def load_fn(i):
        if i >= 4:
            raise IOError(f"decode failed for item {i}")
        return np.zeros((2, 2, 1), np.float32), 0

    loader = MapDataLoader(
        8, load_fn, batch_size=2, shuffle=False, process_index=0, process_count=1
    )
    seen = 0
    with pytest.raises(IOError, match="decode failed"):
        for _ in Prefetcher(loader, depth=1):
            seen += 1
    assert seen == 2  # the two good batches arrived before the error


def test_prefetcher_clean_epoch():
    def load_fn(i):
        return np.full((2, 2, 1), i, np.float32), i

    loader = MapDataLoader(
        6, load_fn, batch_size=2, shuffle=False, process_index=0, process_count=1
    )
    batches = list(Prefetcher(loader))
    assert len(batches) == 3
    assert batches[0]["images"].shape == (2, 2, 2, 1)
    assert batches[2]["prompt"].tolist() == [4, 5]


def test_prefetcher_early_break_releases_worker():
    """Abandoning iteration mid-epoch (engines break at stop_idx) must let
    the worker thread exit instead of blocking forever on the full queue
    and leaking its buffered decoded batches — one thread per eval epoch."""
    import threading
    import time

    started = threading.Event()

    def load_fn(i):
        started.set()
        return np.zeros((2, 2, 1), np.float32), i

    loader = MapDataLoader(
        100, load_fn, batch_size=2, shuffle=False,
        process_index=0, process_count=1,
    )
    before = threading.active_count()
    it = iter(Prefetcher(loader, depth=1))
    next(it)
    assert started.is_set()
    it.close()  # early break: generator finalized without exhausting
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before, "prefetch worker leaked"


class _FailingCheckpointer:
    """Checkpointer whose save always dies mid-write (preemption stand-in)."""

    def save(self, path, state):
        os.makedirs(path, exist_ok=True)  # torn partial write
        raise RuntimeError("preempted mid-save")

    def wait_until_finished(self):
        pass


def test_interrupted_swap_survives_failed_next_save(tmp_path):
    """After a crash between the two swap renames, the complete `state.new`
    is the directory's ONLY checkpoint. The next save must finish the swap
    (rename .new into place) before writing — so even if that save is itself
    preempted, the checkpoint stays loadable."""
    exp = str(tmp_path)
    save_checkpoint(exp, _state(2.0), epoch=2)
    ckpt = os.path.join(exp, "checkpoints")
    final = os.path.join(ckpt, "state")
    os.rename(final, final + ".new")  # crash-between-renames layout
    _mark_complete(final + ".new")

    with pytest.raises(RuntimeError, match="preempted"):
        save_checkpoint(
            exp, _state(9.0), epoch=9, checkpointer=_FailingCheckpointer()
        )
    _assert_loads(ckpt, 2.0, 3)


def test_torn_first_save_not_promoted(tmp_path):
    """A `.new` with NO completeness sentinel (crash during the very first
    save's write) must not be promoted to the canonical `state` dir — it is
    a torn write masquerading as a checkpoint (round-2 advisor finding)."""
    exp = str(tmp_path)
    ckpt = os.path.join(exp, "checkpoints")
    torn = os.path.join(ckpt, "state.new")
    os.makedirs(torn)  # torn partial write, no sentinel
    with open(os.path.join(torn, "garbage"), "w") as f:
        f.write("partial")
    # restore: must NOT see the torn dir as a checkpoint
    with pytest.raises(Exception):
        load_checkpoint(ckpt, _abstract())
    # next save: must discard it and produce a clean checkpoint
    save_checkpoint(exp, _state(4.0), epoch=4)
    _assert_loads(ckpt, 4.0, 5)
    assert not os.path.exists(torn + ".complete")


def test_legacy_presentinel_new_is_promoted(tmp_path):
    """A complete `state.new` written by a build predating the `.complete`
    sentinel (crash between its two swap renames) carries Orbax's own
    `_CHECKPOINT_METADATA` commit marker — it must be recognized as the
    newest checkpoint, not deleted as a torn write (round-3 review)."""
    exp = str(tmp_path)
    save_checkpoint(exp, _state(2.0), epoch=2)
    ckpt = os.path.join(exp, "checkpoints")
    final = os.path.join(ckpt, "state")
    os.rename(final, final + ".new")  # legacy crash layout: NO sentinel
    _assert_loads(ckpt, 2.0, 3)  # restore path accepts the orbax marker
    save_checkpoint(exp, _state(9.0), epoch=9)  # next save finishes the swap
    _assert_loads(ckpt, 9.0, 10)


def test_init_only_orbax_metadata_is_not_completeness_proof(tmp_path):
    """Orbax writes _CHECKPOINT_METADATA at tmp-dir CREATION (init
    timestamp only) and adds commit_timestamp_nsecs at finalize — a torn
    `.new` can carry the file without the commit key and must NOT be
    promoted (round-3 review finding)."""
    import json

    exp = str(tmp_path)
    ckpt = os.path.join(exp, "checkpoints")
    torn = os.path.join(ckpt, "state.new")
    os.makedirs(torn)
    with open(os.path.join(torn, "_CHECKPOINT_METADATA"), "w") as f:
        json.dump({"init_timestamp_nsecs": 1}, f)  # no commit key: torn
    with pytest.raises(Exception):
        load_checkpoint(ckpt, _abstract())
    save_checkpoint(exp, _state(4.0), epoch=4)
    _assert_loads(ckpt, 4.0, 5)
    assert not os.path.exists(torn)


def test_process_slice_requires_both_or_neither():
    """Passing only one of process_index/process_count is a silent-wrong-data
    hazard (the lone index would be overwritten by the jax runtime) — it must
    be rejected loudly."""
    with pytest.raises(AssertionError, match="BOTH"):
        MapDataLoader(
            8,
            lambda i: (np.zeros((2, 2, 1), np.float32), 0),
            batch_size=2,
            shuffle=False,
            process_index=3,
        ).__iter__().__next__()


def test_encoder_mismatch_error_rewrite(tmp_path):
    """A STRUCTURAL to_q/to_k tree mismatch gets the encoder-type guidance;
    a mere shape mismatch on the same leaf keeps its original error."""
    exp = str(tmp_path)
    state = {"attn": {"to_q": {"kernel": jnp.ones((4, 4))}, "v": jnp.ones(2)}}
    save_checkpoint(exp, state, epoch=0)
    ckpt = os.path.join(exp, "checkpoints")
    with pytest.raises(ValueError, match="structurally incompatible"):
        load_checkpoint(ckpt, {"attn": {"v": jnp.ones(2)}})
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(
            ckpt, {"attn": {"to_q": {"kernel": jnp.ones((4, 8))}, "v": jnp.ones(2)}}
        )
