"""TrainState: the single pytree holding everything the jitted step
mutates — student params + norm state, teacher params + norm state,
optimizer momentum, and the step counter.

The teacher is an exact structural twin of the student so the EMA update
is one `jax.tree.map`. Optimizer semantics replicate torch SGD
(momentum=0.9, weight_decay) with a pre-step global-norm gradient clip:
  g <- clip_global(g, 1.0); g <- g + wd * p;
  buf <- mu * buf + g;      p <- p - lr * buf
(the reference's optimizer setup: train_DyCON_Pancreas.py:172,265-270).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Params = Any


class TrainState(NamedTuple):
    step: jnp.ndarray  # i32 scalar; increments only on applied updates
    params: Params
    model_state: Params
    teacher_params: Params
    teacher_state: Params
    opt_state: Any


def make_optimizer(
    schedule, momentum: float = 0.9, weight_decay: float = 1e-4, clip_norm: float = 1.0
) -> optax.GradientTransformation:
    """torch-SGD-equivalent chain. `schedule` maps step -> lr (traced in
    jit, so LR decay costs no recompiles)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(model, key: jax.Array, optimizer) -> TrainState:
    """Init student, clone it into the teacher (the reference copies
    student weights into the teacher at init — ISLES explicitly, BraTS/
    Pancreas implicitly via identical seed/detach), and zero momentum."""
    params, model_state = model.init(key)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        teacher_params=jax.tree.map(jnp.copy, params),
        teacher_state=jax.tree.map(jnp.copy, model_state),
        opt_state=optimizer.init(params),
    )


def ema_update(teacher: Params, student: Params, alpha: jnp.ndarray) -> Params:
    """teacher <- alpha * teacher + (1 - alpha) * student."""
    return jax.tree.map(lambda t, s: alpha * t + (1.0 - alpha) * s, teacher, student)
