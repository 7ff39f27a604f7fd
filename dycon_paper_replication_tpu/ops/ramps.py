"""Hyper-parameter ramp schedules.

Host-side (Python float) schedule helpers. These are evaluated per
iteration/epoch on the host and fed into the jitted train step as scalar
operands, so changing them never triggers recompilation.

Behavioral parity targets (reference, for auditing only — no code taken):
  /root/reference/code/utils/ramps.py:19-41 (sigmoid/linear/cosine ramps)
  /root/reference/code/utils/dycon_losses.py:8-12 (adaptive_beta)
  /root/reference/code/utils/dycon_losses.py:28-47 (threshold ramp)
"""

from __future__ import annotations

import math


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential sigmoid-shaped ramp from 0 to 1 (mean-teacher style).

    w(t) = exp(-5 * (1 - clip(t, 0, L)/L)^2); w(0)=e^-5, w(L)=1.
    """
    if rampup_length == 0:
        return 1.0
    phase = 1.0 - min(max(float(current), 0.0), rampup_length) / rampup_length
    return math.exp(-5.0 * phase * phase)


def linear_rampup(current: float, rampup_length: float) -> float:
    """Linear ramp from 0 to 1 over `rampup_length` steps."""
    assert current >= 0 and rampup_length >= 0
    if current >= rampup_length:
        return 1.0
    return current / rampup_length


def cosine_rampdown(current: float, rampdown_length: float) -> float:
    """Cosine ramp from 1 down to 0 over `rampdown_length` steps."""
    assert 0 <= current <= rampdown_length
    return 0.5 * (math.cos(math.pi * current / rampdown_length) + 1.0)


def adaptive_beta(
    epoch: float, total_epochs: float, max_beta: float = 5.0, min_beta: float = 0.5
) -> float:
    """Exponentially decaying entropy-weighting coefficient for UnCL.

    beta(e) = max_beta * (min_beta/max_beta)^(e/E): starts at max_beta,
    ends at min_beta after E epochs.
    """
    return max_beta * (min_beta / max_beta) ** (epoch / total_epochs)


def threshold_rampup(
    current_epoch: float,
    total_rampup_epochs: float,
    min_threshold: float,
    max_threshold: float,
    steepness: float = 5.0,
) -> float:
    """Sigmoid-shaped ramp of a similarity threshold used by FeCL focal
    weighting: min_threshold -> max_threshold over `total_rampup_epochs`.
    """
    if total_rampup_epochs == 0:
        return max_threshold
    t = min(max(0.0, float(current_epoch)), total_rampup_epochs)
    phase = 1.0 - t / total_rampup_epochs
    ramp = math.exp(-steepness * phase * phase)
    return min_threshold + (max_threshold - min_threshold) * ramp


def poly_lr(base_lr: float, step: int, max_steps: int, power: float = 0.9) -> float:
    """Polynomial LR decay: lr * (1 - step/max_steps)^power (ISLES trainer)."""
    return base_lr * (1.0 - step / max_steps) ** power
