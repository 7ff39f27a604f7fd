"""Batched on-device sliding-window 3-D inference.

Semantics match the reference's patch loop (test_3d_patch.py:293-351):
pad the volume (centered) up to the patch size, place patch origins on a
(stride_xy, stride_xy, stride_z) grid clamped to the far edge, average
per-voxel foreground probabilities over overlapping patches, threshold
at 0.5, un-pad. InstanceNorm makes outputs patch-dependent, so patching
is part of the model's semantics and cannot be replaced by a full-volume
forward.

TPU redesign vs the reference's one-patch-per-forward host loop with an
H2D+D2H round trip per patch:
  * the whole padded volume is placed on device ONCE;
  * a single jitted program gathers patch batches with vmapped
    dynamic_slice, runs the batched forward (projection head skipped),
    and scatter-adds probabilities + counts back with dynamic
    update-slices inside lax.scan — no host round trips at all;
  * XLA recompilation is bounded by bucketing: volume shapes round up to
    multiples of 32 (right-side zero padding — unvisited by any patch
    window, sliced off afterwards) and the origin list pads to a
    power-of-two patch count by REPEATING an origin, which leaves the
    score/count ratio untouched (x+x)/(1+1) == x.
Duplicate origins produced by the clamped grid are deduplicated — the
overlap average is invariant to multiplicity.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def compute_origins(
    vol_shape: tuple[int, int, int],
    patch: tuple[int, int, int],
    stride_xy: int,
    stride_z: int,
) -> np.ndarray:
    """Deduplicated (K, 3) int32 patch origins on the clamped grid."""
    strides = (stride_xy, stride_xy, stride_z)
    axes = []
    for size, p, s in zip(vol_shape, patch, strides):
        n = math.ceil((size - p) / s) + 1 if size > p else 1
        axes.append(sorted({min(s * i, size - p) for i in range(n)}))
    grid = np.array(
        [(x, y, z) for x in axes[0] for y in axes[1] for z in axes[2]], dtype=np.int32
    )
    return grid


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class SlidingWindowInference:
    """Compiled sliding-window engine for one (patch, strides) protocol.

    Usage: `label_map, score_map = sw(params, state, image)` with image a
    (D1, D2, D3) numpy volume; returns numpy (D1, D2, D3) int and float.
    """

    def __init__(
        self,
        model,
        patch_size: tuple[int, int, int],
        stride_xy: int,
        stride_z: int,
        patch_batch: int = 8,
        shape_bucket: int = 32,
    ):
        self.model = model
        self.patch = tuple(patch_size)
        self.stride_xy = stride_xy
        self.stride_z = stride_z
        self.patch_batch = patch_batch
        self.shape_bucket = shape_bucket
        self._compiled: dict = {}

    def _device_fn(self, vol_shape: tuple[int, int, int], n_chunks: int):
        key = (vol_shape, n_chunks)
        if key in self._compiled:
            return self._compiled[key]
        patch = self.patch
        B = self.patch_batch
        model = self.model

        @jax.jit
        def run(params, state, volume, origins):
            # volume: (*vol_shape, 1); origins: (n_chunks*B, 3) i32
            score = jnp.zeros(vol_shape, jnp.float32)
            cnt = jnp.zeros(vol_shape, jnp.float32)

            def gather(origin):
                return jax.lax.dynamic_slice(
                    volume, (origin[0], origin[1], origin[2], 0), patch + (1,)
                )

            def chunk_body(carry, chunk_origins):
                score, cnt = carry
                patches = jax.vmap(gather)(chunk_origins)  # (B, *patch, 1)
                (_, logits, _), _ = model.apply(
                    params, state, patches, train=False, with_projection=False
                )
                probs = jax.nn.softmax(logits, axis=-1)[..., 1]  # (B, *patch)

                def add_one(inner, op):
                    sc, ct = inner
                    origin, prob = op
                    o = (origin[0], origin[1], origin[2])
                    win = jax.lax.dynamic_slice(sc, o, patch)
                    sc = jax.lax.dynamic_update_slice(sc, win + prob, o)
                    wct = jax.lax.dynamic_slice(ct, o, patch)
                    ct = jax.lax.dynamic_update_slice(ct, wct + 1.0, o)
                    return (sc, ct), None

                (score, cnt), _ = jax.lax.scan(add_one, (score, cnt), (chunk_origins, probs))
                return (score, cnt), None

            chunks = origins.reshape(n_chunks, B, 3)
            (score, cnt), _ = jax.lax.scan(chunk_body, (score, cnt), chunks)
            return score / jnp.maximum(cnt, 1e-12)

        self._compiled[key] = run
        return run

    def __call__(self, params, state, image: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        image = np.asarray(image, np.float32)
        w, h, d = image.shape

        # centered pad up to patch size (reference pad rule)
        pads, padded = [], image
        for size, p in zip(image.shape, self.patch):
            extra = max(p - size, 0)
            pads.append((extra // 2, extra - extra // 2))
        if any(p != (0, 0) for p in pads):
            padded = np.pad(image, pads, mode="constant")
        true_shape = padded.shape

        origins = compute_origins(true_shape, self.patch, self.stride_xy, self.stride_z)
        k = len(origins)

        # bucket: right-pad volume to multiples of shape_bucket, repeat
        # origins to a power-of-two multiple of patch_batch
        bucket_shape = tuple(
            max(_round_up(s, self.shape_bucket), p) for s, p in zip(true_shape, self.patch)
        )
        if bucket_shape != true_shape:
            padded = np.pad(
                padded,
                [(0, b - s) for s, b in zip(true_shape, bucket_shape)],
                mode="constant",
            )
        k_bucket = self.patch_batch
        while k_bucket < k:
            k_bucket *= 2
        reps = np.tile(origins[-1:], (k_bucket - k, 1))
        origins_b = np.concatenate([origins, reps], axis=0)
        n_chunks = k_bucket // self.patch_batch

        run = self._device_fn(bucket_shape, n_chunks)
        score = run(params, state, jnp.asarray(padded[..., None]), jnp.asarray(origins_b))
        score = np.asarray(score)[: true_shape[0], : true_shape[1], : true_shape[2]]

        # un-pad the centered patch padding
        (wl, _), (hl, _), (dl, _) = pads
        score = score[wl : wl + w, hl : hl + h, dl : dl + d]
        label_map = (score > 0.5).astype(np.int64)
        return label_map, score
