"""Orbax checkpointing with the reference's latest/best layout and sidecar state.

Reference scheme (`diffusion/diffusion_classifier.py:727-805`): every save
writes the full training state to ``<experiment_path>/checkpoints`` plus a
sidecar ``experiment_state`` holding ``{epoch+1, best_metric,
experiment_key}``; on tracked-metric improvement a full copy also goes to
``<experiment_path>/best_checkpoint``. Loads restore state + epoch +
best-metric + run key; inference picks its folder via
``config.checkpoint_folder`` (`:592,622`).

Here the state is the whole :class:`TrainState` pytree (params, EMA params,
optimizer state, step/EMA counters) saved via Orbax, and the sidecar is JSON.
Saves are preemption-safe: Orbax writes into a fresh directory which is
atomically swapped over the previous one only after the write completes.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "latest_sidecar"]

_SIDECAR = "experiment_state.json"
_STATE = "state"
# Orbax's step-metadata file. NOTE its mere existence is NOT a completeness
# proof — orbax (0.11) writes it at tmp-directory CREATION with an init
# timestamp, and only adds ``commit_timestamp_nsecs`` when the save
# finalizes (verified against the installed
# `orbax/checkpoint/_src/path/atomicity.py`). So the secondary completeness
# proof for ``state.new`` dirs written by builds predating the
# ``.complete`` sentinel is that commit key, not the file.
_ORBAX_COMMIT = "_CHECKPOINT_METADATA"


def _new_is_complete(tmp: str) -> bool:
    if os.path.exists(tmp + ".complete"):
        return True
    meta = os.path.join(tmp, _ORBAX_COMMIT)
    if not os.path.exists(meta):
        return False
    try:
        with open(meta) as f:
            return json.load(f).get("commit_timestamp_nsecs") is not None
    except (OSError, ValueError):
        return False  # unreadable/torn metadata: not proof of anything


def _rm(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def _barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process).

    Orbax's save is a COLLECTIVE: every process must call it (process 0
    writes replicated data, the others write their exclusive shards and
    participate in the commit barrier). The filesystem bookkeeping around it
    (pre-clean, sentinel, renames) must happen on exactly one process, with
    the others held at these barriers so no rank races ahead into the next
    save while process 0 is still renaming this one.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _atomic_save(checkpointer: ocp.StandardCheckpointer, directory: str, state):
    """Crash-safe save of ``<directory>/state``.

    POSIX cannot rename over a non-empty directory, so a directory swap is
    necessarily two renames with a window where ``state`` is absent. Safety
    comes from (a) FINISHING an interrupted swap first — but only when the
    ``.new.complete`` sentinel (written strictly after
    ``wait_until_finished``) proves the ``.new`` write finished; a torn
    ``.new`` from a crash mid-first-save is deleted instead of being
    promoted to a checkpoint that merely looks normal — (b) cleaning the
    remaining stale leftovers *before* writing (a leftover ``.old`` would
    make the swap's rename raise), and (c) :func:`_resolve_state_dir`
    falling back to a fully written ``.new`` (newer) or ``.old`` (previous)
    directory on restore — so every crash point leaves the newest complete
    checkpoint loadable.
    """
    final = os.path.join(directory, _STATE)
    tmp, old = final + ".new", final + ".old"
    ok = tmp + ".complete"
    primary = jax.process_index() == 0
    if primary:
        if not os.path.exists(final) and os.path.exists(tmp):
            if _new_is_complete(tmp):
                # Interrupted swap: this .new is the directory's newest
                # complete checkpoint — FINISH the swap rather than deleting
                # it, so a second crash during the upcoming save still
                # leaves it loadable.
                os.rename(tmp, final)
            else:
                # Torn write (crash during the very first save): nothing
                # loadable inside — do not let it masquerade as a checkpoint.
                _rm(tmp)
        if os.path.exists(final):
            for stale in (tmp, old, ok):
                _rm(stale)
    _barrier("ckpt-preclean")  # no rank may write into tmp before it is clean
    checkpointer.save(tmp, state)  # collective: every process participates
    checkpointer.wait_until_finished()  # tmp is complete before any rename
    if primary:
        with open(ok, "w") as f:
            f.write("complete")
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        _rm(ok)
        _rm(old)
    _barrier("ckpt-commit")  # nobody starts the next save mid-rename


def _resolve_state_dir(checkpoint_path: str) -> str:
    """Pick the state directory, recovering from an interrupted swap.

    Preference: ``state`` (normal) → ``state.new`` (crash between the two
    swap renames, PROVEN complete by its ``.complete`` sentinel) →
    ``state.old`` (previous checkpoint).
    """
    final = os.path.join(checkpoint_path, _STATE)
    if os.path.exists(final):
        return final
    tmp = final + ".new"
    if os.path.exists(tmp) and _new_is_complete(tmp):
        return tmp
    old = final + ".old"
    if os.path.exists(old):
        return old
    return final  # let Orbax raise its not-found error


def save_checkpoint(
    experiment_path: str,
    state: Any,
    *,
    epoch: int,
    best_metric: Optional[float] = None,
    experiment_key: Optional[str] = None,
    best: bool = False,
    checkpointer: Optional[ocp.StandardCheckpointer] = None,
) -> str:
    """Save latest (and optionally best) checkpoint. Returns the latest dir.

    COLLECTIVE under multi-process: every process must call this (the Orbax
    save inside is itself collective); process 0 alone writes the sidecar
    and performs the swap renames. Single-process behavior is unchanged.
    """
    ckptr = checkpointer or ocp.StandardCheckpointer()
    sidecar = {
        "epoch": epoch + 1,  # reference stores the NEXT epoch (`:745`)
        "best_metric": best_metric,
        "experiment_key": experiment_key,
    }
    targets = [os.path.join(experiment_path, "checkpoints")]
    if best:
        targets.append(os.path.join(experiment_path, "best_checkpoint"))
    for directory in targets:
        os.makedirs(directory, exist_ok=True)
        _atomic_save(ckptr, directory, state)
        if jax.process_index() == 0:
            sidecar_path = os.path.join(directory, _SIDECAR)
            with open(sidecar_path + ".new", "w") as f:
                json.dump(sidecar, f)
            os.replace(sidecar_path + ".new", sidecar_path)
    return targets[0]


def _fill_none_entries_from_metadata(ckptr, state_dir: str, abstract_state):
    """Type ``None``-valued top-level template entries from on-disk metadata.

    An eval-only engine carries no optimizer, so its restore template has
    ``opt_state=None`` — but Orbax requires template and checkpoint
    structures to match. Such entries are typed as ShapeDtypeStructs read
    from the checkpoint's own metadata (the caller restores and then
    ignores them). Functional analog of the reference loading optimizer
    state only when an optimizer object exists (`:769-805`).
    """
    if not isinstance(abstract_state, dict) or not any(
        v is None for v in abstract_state.values()
    ):
        return abstract_state
    meta = ckptr.metadata(state_dir).item_metadata.tree
    filled = dict(abstract_state)
    for key, value in abstract_state.items():
        if value is None and meta.get(key) is not None:
            filled[key] = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta[key]
            )
    return filled


def load_checkpoint(
    checkpoint_path: str,
    abstract_state: Any,
    *,
    checkpointer: Optional[ocp.StandardCheckpointer] = None,
):
    """Restore ``(state, epoch, best_metric, experiment_key)`` from a folder.

    ``abstract_state`` is a matching pytree (concrete or ShapeDtypeStruct) used
    by Orbax to type the restore — the functional analog of the reference
    restoring into live module/optimizer objects (`:769-805`).
    """
    ckptr = checkpointer or ocp.StandardCheckpointer()
    state_dir = _resolve_state_dir(checkpoint_path)
    abstract_state = _fill_none_entries_from_metadata(
        ckptr, state_dir, abstract_state
    )
    try:
        state = ckptr.restore(state_dir, abstract_state)
    except Exception as e:
        # Cross-attention over a ONE-token context skips the q/k projections
        # entirely (models/layers.py CrossAttention), so such checkpoints
        # structurally lack to_q/to_k and cannot be loaded into a model
        # built for multi-token (e.g. t5) contexts, and vice versa. Surface
        # that instead of Orbax's raw pytree mismatch — but only for the
        # STRUCTURAL (missing/extra tree key) case; shape/dtype mismatches
        # on a to_q leaf (e.g. a changed cross_attention_dim) must keep
        # their original error.
        msg = str(e)
        structural = (
            "structures do not match" in msg or "missing" in msg.lower()
        )
        if structural and ("to_q" in msg or "to_k" in msg):
            raise ValueError(
                "Checkpoint/model mismatch on cross-attention q/k "
                "projections: models initialized with single-token contexts "
                "(e.g. encoder_type='nn' class embeddings) do not create "
                "to_q/to_k parameters and are structurally incompatible "
                "with multi-token contexts (e.g. encoder_type='t5'). "
                "Re-initialize and re-train with the target encoder type."
            ) from e
        raise
    epoch, best_metric, experiment_key = 0, None, None
    sidecar_path = os.path.join(checkpoint_path, _SIDECAR)
    if os.path.exists(sidecar_path):
        with open(sidecar_path) as f:
            sidecar = json.load(f)
        epoch = sidecar.get("epoch", 0)
        best_metric = sidecar.get("best_metric")
        experiment_key = sidecar.get("experiment_key")
    return state, epoch, best_metric, experiment_key


def latest_sidecar(checkpoint_path: str) -> Optional[dict]:
    sidecar_path = os.path.join(checkpoint_path, _SIDECAR)
    if not os.path.exists(sidecar_path):
        return None
    with open(sidecar_path) as f:
        return json.load(f)
