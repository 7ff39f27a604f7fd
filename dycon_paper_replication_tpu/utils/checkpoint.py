"""Orbax checkpointing with full resume, off the training critical path.

Closes the reference's checkpoint gap (SURVEY.md §5): the reference only
saves the student state_dict (no optimizer, no teacher, no step — resume
impossible; train_DyCON_Pancreas.py:301-320). Here a checkpoint is the
whole TrainState pytree {step, student params+norm state, teacher
params+norm state, optimizer momentum}, plus the reference's
best/periodic cadence and hyperparameter-encoded run-directory
convention (config.snapshot_path).

Asynchrony, honestly: orbax's `StandardCheckpointer` (an
`AsyncCheckpointer` since orbax 0.4) already writes to disk in a
background thread — but its `save()` still BLOCKS the caller on the
device→host fetch of every array, which through a slow host link is the
dominant cost (~100 MB of state). So `save_checkpoint` here hands the
whole save (fetch + write) to a single background worker thread and
returns immediately. The caller must pass a state that stays valid
until the save completes — a donating train loop must snapshot first
(`Trainer._copy_state` makes an on-device copy, ~0.3 ms). Saves are
serialized in submission order; `wait_until_finished()` drains the
queue and re-raises the first failure.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any

import jax
import orbax.checkpoint as ocp


_checkpointer: ocp.Checkpointer | None = None
_executor: ThreadPoolExecutor | None = None
_pending: list[Future] = []
_lock = threading.Lock()


def _get_checkpointer() -> ocp.Checkpointer:
    global _checkpointer
    if _checkpointer is None:
        _checkpointer = ocp.StandardCheckpointer()
    return _checkpointer


def _get_executor() -> ThreadPoolExecutor:
    global _executor
    if _executor is None:
        _executor = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
    return _executor


def save_checkpoint(
    path: str,
    state: Any,
    force: bool = True,
    block: bool = False,
    meta: dict | None = None,
) -> None:
    """Queue a pytree checkpoint save to `path` (directory, created fresh).

    Returns immediately (unless `block`); the device→host fetch and disk
    write run on the checkpoint worker thread. `state` must remain valid
    until the save completes: from a `donate_argnums` train loop, pass a
    snapshot copy, not the live (about-to-be-donated) state.

    `meta` (JSON-serializable) is written as a `graft_meta.json` sidecar
    inside the checkpoint dir: run-level facts that live outside the
    pytree (the best-val bar, notably) survive a resume even when the
    directory name doesn't encode them (ADVICE r4: resuming a run dir
    whose only checkpoint is `<model>_best_model` must not reset the
    best bar to 0 and then overwrite the genuine best with worse saves).
    """
    path = os.path.abspath(path)

    def _do():
        # orbax's own save is async for the WRITE; calling it from the
        # worker moves the blocking device fetch off the train loop too.
        # wait_until_finished serializes against the next queued save.
        c = _get_checkpointer()
        c.save(path, state, force=force)
        c.wait_until_finished()
        if meta is not None:
            import json

            with open(os.path.join(path, "graft_meta.json"), "w") as f:
                json.dump(meta, f)

    with _lock:
        # surface earlier failures promptly instead of at exit
        for f in [f for f in _pending if f.done()]:
            _pending.remove(f)
            exc = f.exception()
            if exc is not None:
                raise RuntimeError(f"async checkpoint save failed") from exc
        fut = _get_executor().submit(_do)
        _pending.append(fut)
    if block:
        fut.result()


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint; `template` supplies structure/shapes
    (e.g. a freshly created TrainState)."""
    wait_until_finished()  # a restore may race a queued save of the same dir
    path = os.path.abspath(path)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return _get_checkpointer().restore(path, abstract)


def best_checkpoint_path(snapshot_path: str, model_name: str) -> str:
    return os.path.join(snapshot_path, f"{model_name}_best_model")


def latest_checkpoint_path(snapshot_path: str, model_name: str) -> tuple[str, float]:
    """Resolve `resume="auto"`: the highest-step checkpoint in a run dir.

    Scans `iter_<N>[_dice_<D>]` directories (the periodic/best-iter
    cadence) and returns (path_of_max_N, best_dice_seen). The best dice
    is the max over the `_dice_` filenames and any `graft_meta.json`
    sidecars, so a resumed run restores its best-so-far bar instead of
    re-saving "best" checkpoints for worse validations. Falls back to
    `<model>_best_model` (whose sidecar carries its dice) when no iter
    checkpoints exist; raises FileNotFoundError when the dir has no
    checkpoints at all (the reference cannot resume; SURVEY.md §5)."""
    import json
    import re

    def _meta_dice(ckpt_dir: str) -> float:
        try:
            with open(os.path.join(ckpt_dir, "graft_meta.json")) as f:
                return float(json.load(f).get("best_dice", 0.0))
        except (OSError, ValueError):
            return 0.0

    best_dice = 0.0
    latest: tuple[int, str] | None = None
    for name in os.listdir(snapshot_path) if os.path.isdir(snapshot_path) else []:
        m = re.fullmatch(r"iter_(\d+)(?:_dice_([0-9.]+))?", name)
        if not m:
            continue
        full = os.path.join(snapshot_path, name)
        if not os.path.isdir(full):
            continue
        step = int(m.group(1))
        if m.group(2):
            best_dice = max(best_dice, float(m.group(2)))
        best_dice = max(best_dice, _meta_dice(full))
        if latest is None or step > latest[0]:
            latest = (step, full)
    if latest is not None:
        return latest[1], best_dice
    best = best_checkpoint_path(snapshot_path, model_name)
    if os.path.isdir(best):
        return best, max(best_dice, _meta_dice(best))
    raise FileNotFoundError(f"no checkpoints to resume from in {snapshot_path}")


def iter_checkpoint_path(snapshot_path: str, iter_num: int, dice: float | None = None) -> str:
    if dice is not None:
        return os.path.join(snapshot_path, f"iter_{iter_num}_dice_{round(dice, 4)}")
    return os.path.join(snapshot_path, f"iter_{iter_num}")


def wait_until_finished() -> None:
    """Drain all queued saves; re-raise the first failure."""
    with _lock:
        pending = list(_pending)
        _pending.clear()
    for f in pending:
        exc = f.exception()  # waits
        if exc is not None:
            raise RuntimeError("async checkpoint save failed") from exc
    c = _get_checkpointer()
    if hasattr(c, "wait_until_finished"):
        c.wait_until_finished()
