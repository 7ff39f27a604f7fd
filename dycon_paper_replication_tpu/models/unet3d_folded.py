"""UNet3D forward in fold-2 (space-to-depth) execution.

Numerically identical to `unet3d_apply` (same params pytree, same
outputs, tested to f32 tolerance) but the two small-channel levels —
level 1 (C=f0, full resolution) and level 2 (C=f1, half resolution) —
run FOLDED: 2x2x2 spatial blocks live in the channel/lane axis, so
every tensor XLA touches has >= 128 effective lanes instead of 16/32
(see ops/folding.py for the phase-alternation math). Levels 3..center
and the two deepest decoder stages keep the plain NDHWC path (C >= 64,
small spatial extents).

This is the TPU answer to the reference's cuDNN 3^3 conv stacks
(/root/reference/code/networks/UNet3D_contrastive.py:276-316): instead
of translating the layer loop, the data layout is reshaped so the MXU
sees dense 128..768-lane contractions. Differentiable end-to-end — the
same engine serves training.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import layers
from ..ops.folding import (
    conv1x1_folded,
    fold2,
    folded_conv3,
    instance_norm_folded,
    phase1_lane_masks,
    pool_consume_fold,
    pool_refold,
    unfold2,
    upsample2x_folded,
)
from ..ops.resize import max_pool_2x, upsample2x

Params = dict


def _folded_block(p: Params, x: jnp.ndarray, *, grid, n_valid: int, cd) -> jnp.ndarray:
    """UnetConv3 on folded data: conv(0->1) + IN + ReLU + conv(1->0) + IN + ReLU.

    x: (B, *grid, 8Ci) phase-0. Returns (B, *grid, 8Co) phase-0. The
    phase-1 intermediate carries out-of-range boundary planes; the
    factored lane masks are fused into the IN stats and output (which
    both zeroes them for conv2 and keeps them out of the statistics)."""
    co = p["conv1"]["w"].shape[4]
    masks = phase1_lane_masks(tuple(g + 1 for g in grid), co)
    h = folded_conv3(x, p["conv1"]["w"], p["conv1"].get("b"), to_phase=1, compute_dtype=cd)
    h = jax.nn.relu(instance_norm_folded(h, n_valid, masks=masks))
    h = folded_conv3(h, p["conv2"]["w"], p["conv2"].get("b"), to_phase=0, compute_dtype=cd)
    return jax.nn.relu(instance_norm_folded(h, n_valid))


def unet3d_trunk_folded(
    params: Params,
    xf: jnp.ndarray,
    cfg,
    *,
    train: bool = False,
    d1_key: jax.Array | None = None,
    d2_key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder + decoder on FOLDED input, FOLDED output.

    xf: (B, G1, G2, G3, 8*in_ch) phase-0 folded (grid dims % 8 == 0).
    Returns (h, center): h the last decoder feature map, folded phase-0
    (B, G1, G2, G3, 8*f0); center the unfolded bottleneck (for the
    projection head)."""
    from .unet3d import _conv_block

    cd = cfg.compute_dtype
    _, G1, G2, G3, _ = xf.shape
    assert G1 % 8 == 0 and G2 % 8 == 0 and G3 % 8 == 0, (G1, G2, G3)
    inner_cfg = dataclasses.replace(cfg, layout="NDHWC")

    g1 = (G1, G2, G3)
    g2 = tuple(g // 2 for g in g1)
    n1 = 8 * G1 * G2 * G3
    n2 = n1 // 8

    # --- folded encoder levels 1-2 ---
    s1 = _folded_block(params["conv1"], xf, grid=g1, n_valid=n1, cd=cd)
    s2 = _folded_block(params["conv2"], pool_refold(s1), grid=g2, n_valid=n2, cd=cd)
    h = pool_consume_fold(s2)  # (B, *g2, f1) unfolded level-3 input

    # --- unfolded middle (C >= 64, small spatial) ---
    h = _conv_block(params["conv3"], h, inner_cfg)
    s3 = h
    h = max_pool_2x(h)
    h = _conv_block(params["conv4"], h, inner_cfg)
    s4 = h
    h = max_pool_2x(h)
    center = _conv_block(params["center"], h, inner_cfg)
    center = layers.dropout(center, cfg.dropout_rate, d1_key, train)

    h = center
    for name, skip in (("up_concat4", s4), ("up_concat3", s3)):
        up = upsample2x(h, spatial_axes=(1, 2, 3))
        h = jnp.concatenate([skip.astype(up.dtype), up], axis=-1)
        h = _conv_block(params[name], h, inner_cfg)

    # --- folded decoder levels 2-1 (skip-first concat order, as unfolded) ---
    up = upsample2x_folded(h)  # folded (2*g2)^3 x f2
    h = jnp.concatenate([s2.astype(up.dtype), up], axis=-1)
    h = _folded_block(params["up_concat2"], h, grid=g2, n_valid=n2, cd=cd)

    up = upsample2x_folded(unfold2(h))  # folded (2*g1)^3 x f1
    h = jnp.concatenate([s1.astype(up.dtype), up], axis=-1)
    h = _folded_block(params["up_concat1"], h, grid=g1, n_valid=n1, cd=cd)
    h = layers.dropout(h, cfg.dropout_rate, d2_key, train)
    return h, center


def unet3d_seg_folded_io(params: Params, state: Params, xf: jnp.ndarray, cfg) -> jnp.ndarray:
    """Eval-mode seg head with folded input AND output — the packed
    inter-op pipeline entry for the sliding-window engine.

    xf: (B, G1, G2, G3, 8*in_ch) phase-0 folded patches. Returns folded
    seg logits (B, G1, G2, G3, 8*n_classes) f32, class-major lanes
    (lane = class * 8 + sub-position) — identical to
    fold2(seg_unfolded). Keeping IO folded means the caller never pays
    the per-patch fold/unfold transposes nor materializes the
    (.., n_classes)-minor tensor that XLA lane-pads 64x."""
    h, _ = unet3d_trunk_folded(params, xf, cfg, train=False)
    return conv1x1_folded(
        h, params["out_conv2"]["w"], params["out_conv2"].get("b"),
        compute_dtype=cfg.compute_dtype,
    ).astype(jnp.float32)


def unet3d_apply_folded(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    cfg,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    with_projection: bool = True,
):
    from .unet3d import projection_head

    cd = cfg.compute_dtype
    B, D, H, W, _ = x.shape
    assert D % 16 == 0 and H % 16 == 0 and W % 16 == 0, (D, H, W)
    inner_cfg = dataclasses.replace(cfg, layout="NDHWC")
    if train and rng is not None:
        d1_key, d2_key, aspp_key = jax.random.split(rng, 3)
    else:
        d1_key = d2_key = aspp_key = None

    h, center = unet3d_trunk_folded(
        params, fold2(x), cfg, train=train, d1_key=d1_key, d2_key=d2_key
    )

    new_state = dict(state)
    sdf = jnp.tanh(
        unfold2(conv1x1_folded(h, params["final"]["w"], params["final"].get("b"),
                               compute_dtype=cd)).astype(jnp.float32)
    )
    seg = unfold2(
        conv1x1_folded(h, params["out_conv2"]["w"], params["out_conv2"].get("b"),
                       compute_dtype=cd)
    ).astype(jnp.float32)
    if not with_projection:
        return (sdf, seg, None), new_state

    features, updates = projection_head(
        params, state, center, inner_cfg, train=train, aspp_key=aspp_key
    )
    new_state.update(updates)
    return (sdf, seg, features), new_state
