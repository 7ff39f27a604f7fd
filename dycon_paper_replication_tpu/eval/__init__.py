"""Evaluation engine: batched on-device sliding-window inference and the
per-dataset validation / test drivers."""

from .sliding_window import SlidingWindowInference
from .evaluator import (
    WholeVolumeInference,
    iter_h5_volumes,
    var_all_case,
    test_all_case,
    var_all_case_wholevolume,
    test_all_case_wholevolume,
)
