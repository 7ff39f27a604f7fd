"""Orbax checkpointing with full resume.

Closes the reference's checkpoint gap (SURVEY.md §5): the reference only
saves the student state_dict (no optimizer, no teacher, no step — resume
impossible; train_DyCON_Pancreas.py:301-320). Here a checkpoint is the
whole TrainState pytree {step, student params+norm state, teacher
params+norm state, optimizer momentum}, saved asynchronously off the
training critical path, plus the reference's best/periodic cadence and
hyperparameter-encoded run-directory convention (config.snapshot_path).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


_checkpointer: ocp.Checkpointer | None = None


def _get_checkpointer() -> ocp.Checkpointer:
    global _checkpointer
    if _checkpointer is None:
        _checkpointer = ocp.StandardCheckpointer()
    return _checkpointer


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree checkpoint to `path` (directory, created fresh)."""
    path = os.path.abspath(path)
    _get_checkpointer().save(path, state, force=force)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint; `template` supplies structure/shapes
    (e.g. a freshly created TrainState)."""
    path = os.path.abspath(path)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return _get_checkpointer().restore(path, abstract)


def best_checkpoint_path(snapshot_path: str, model_name: str) -> str:
    return os.path.join(snapshot_path, f"{model_name}_best_model")


def iter_checkpoint_path(snapshot_path: str, iter_num: int, dice: float | None = None) -> str:
    if dice is not None:
        return os.path.join(snapshot_path, f"iter_{iter_num}_dice_{round(dice, 4)}")
    return os.path.join(snapshot_path, f"iter_{iter_num}")


def wait_until_finished() -> None:
    c = _get_checkpointer()
    if hasattr(c, "wait_until_finished"):
        c.wait_until_finished()
