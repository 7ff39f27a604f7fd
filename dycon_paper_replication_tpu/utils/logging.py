"""Experiment observability: TensorBoard scalars + log file + stdout.

Scalar tag names match the reference trainers exactly (info/loss,
info/f_loss, train/Dice, ... — train_DyCON_Pancreas.py:276-295) so runs
are comparable side-by-side in TensorBoard. Falls back to a JSONL
metrics file when tensorboardX is unavailable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any

try:
    from tensorboardX import SummaryWriter  # type: ignore

    _HAVE_TB = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    _HAVE_TB = False


class ExperimentLogger:
    def __init__(self, snapshot_path: str, also_stdout: bool = True):
        os.makedirs(snapshot_path, exist_ok=True)
        self.snapshot_path = snapshot_path
        self.writer = SummaryWriter(os.path.join(snapshot_path, "log")) if _HAVE_TB else None
        self.jsonl = open(os.path.join(snapshot_path, "metrics.jsonl"), "a")

        self.logger = logging.getLogger(f"dycon.{os.path.basename(snapshot_path)}")
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        fmt = logging.Formatter("[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S")
        fh = logging.FileHandler(os.path.join(snapshot_path, "log.txt"))
        fh.setFormatter(fmt)
        self.logger.addHandler(fh)
        if also_stdout:
            sh = logging.StreamHandler(sys.stdout)
            sh.setFormatter(fmt)
            self.logger.addHandler(sh)

    def info(self, msg: str, *args: Any) -> None:
        self.logger.info(msg, *args)

    def scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        self.jsonl.write(json.dumps({"t": time.time(), "tag": tag, "value": value, "step": step}) + "\n")

    def scalars(self, values: dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)
        self.jsonl.flush()

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
        self.jsonl.close()
