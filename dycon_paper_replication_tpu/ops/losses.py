"""Generic segmentation / SSL losses as pure jnp functions.

Layout convention for this whole framework: volumetric tensors are
channels-last NDHWC, i.e. logits are (B, D1, D2, D3, C) and integer
label maps are (B, D1, D2, D3). Channels-last is the natural TPU layout
(the lane dimension maps to channels) and what XLA tiles best.

Behavioral parity targets (reference, for auditing only):
  /root/reference/code/utils/losses.py:8-16   (dice_loss)
  /root/reference/code/utils/losses.py:65-104 (softmax_mse_loss / softmax_kl_loss)
  /root/reference/code/utils/losses.py:119-153 (FocalLoss)
  /root/reference/code/utils/losses.py:156-192 (DiceLoss, n-class)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy over all voxels.

    logits: (..., C) float; labels: (...) int class indices.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(picked)


def dice_loss(score: jnp.ndarray, target: jnp.ndarray, smooth: float = 1e-5) -> jnp.ndarray:
    """Soft binary Dice loss over the whole batch (single global reduction).

    score: foreground probability map, any shape; target: same-shape
    binary mask (bool or {0,1}).
    """
    target = target.astype(score.dtype)
    intersect = jnp.sum(score * target)
    y_sum = jnp.sum(target * target)
    z_sum = jnp.sum(score * score)
    return 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)


def dice_loss_nclass(
    probs: jnp.ndarray, labels: jnp.ndarray, num_classes: int, smooth: float = 1e-5
) -> jnp.ndarray:
    """N-class soft Dice: one-hot the labels, average the per-class soft
    Dice losses (each a single global reduction), matching the reference's
    `DiceLoss` module used by the ISLES trainer.

    probs: (..., C) softmax probabilities; labels: (...) int map.
    """
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)  # (..., C)
    intersect = jnp.sum(probs * one_hot, axis=tuple(range(probs.ndim - 1)))
    z_sum = jnp.sum(probs * probs, axis=tuple(range(probs.ndim - 1)))
    y_sum = jnp.sum(one_hot * one_hot, axis=tuple(range(probs.ndim - 1)))
    per_class = 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return jnp.mean(per_class)


def softmax_mse_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray) -> jnp.ndarray:
    """Element-wise (softmax(a) - softmax(b))^2 map; caller reduces.

    Gradient flows to `input_logits` only (targets are stopped), the
    mean-teacher convention.
    """
    a = jax.nn.softmax(input_logits, axis=-1)
    b = jax.lax.stop_gradient(jax.nn.softmax(target_logits, axis=-1))
    return (a - b) ** 2


def mse_consistency_loss(input_probs: jnp.ndarray, target_probs: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference of two probability maps (already softmaxed).
    Used for the plain consistency term on the unlabeled slice."""
    return jnp.mean((input_probs - jax.lax.stop_gradient(target_probs)) ** 2)


def softmax_kl_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray) -> jnp.ndarray:
    """KL(target || input) with 'mean' reduction over ALL elements
    (including the class axis), matching torch F.kl_div(reduction='mean')
    semantics: mean of target * (log target - log input)."""
    input_log = jax.nn.log_softmax(input_logits, axis=-1)
    target = jax.lax.stop_gradient(jax.nn.softmax(target_logits, axis=-1))
    target_log = jnp.log(jnp.clip(target, 1e-30, None))
    return jnp.mean(target * (target_log - input_log))


def kl_consistency_loss(
    input_probs: jnp.ndarray, target_probs: jnp.ndarray
) -> jnp.ndarray:
    """KL consistency on probability maps (for the --consistency_type=kl
    path where the trainer feeds probs; mirrors the mse variant)."""
    target = jax.lax.stop_gradient(target_probs)
    return jnp.mean(
        target * (jnp.log(jnp.clip(target, 1e-30, None)) - jnp.log(jnp.clip(input_probs, 1e-30, None)))
    )


def entropy_loss(probs: jnp.ndarray, num_classes: int = 2) -> jnp.ndarray:
    """Mean normalized Shannon entropy of a probability map (..., C)."""
    ent = -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1) / jnp.log(
        jnp.asarray(float(num_classes))
    )
    return jnp.mean(ent)


def entropy_map(probs: jnp.ndarray) -> jnp.ndarray:
    """Per-voxel Shannon entropy of a probability map (..., C) -> (...)."""
    return -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-class focal loss, mean-reduced.

    logits: (..., C); labels: (...) int; alpha: optional (C,) class weights.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    if alpha is not None:
        at = jnp.take(jnp.asarray(alpha, logits.dtype), labels.astype(jnp.int32))
        logpt = logpt * at
    return jnp.mean(-((1.0 - pt) ** gamma) * logpt)


def symmetric_mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error with gradients flowing to both inputs."""
    return jnp.mean((a - b) ** 2)
