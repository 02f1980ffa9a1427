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

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "latest_sidecar"]

_SIDECAR = "experiment_state.json"
_STATE = "state"


def _atomic_save(checkpointer: ocp.StandardCheckpointer, directory: str, state):
    final = os.path.join(directory, _STATE)
    tmp = final + ".new"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    checkpointer.save(tmp, state)
    checkpointer.wait_until_finished()
    old = final + ".old"
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(tmp, final)
    if os.path.exists(old):
        shutil.rmtree(old)


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
    """Save latest (and optionally best) checkpoint. Returns the latest dir."""
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
        with open(os.path.join(directory, _SIDECAR), "w") as f:
            json.dump(sidecar, f)
    return targets[0]


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
    state = ckptr.restore(os.path.join(checkpoint_path, _STATE), abstract_state)
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
