"""V-Net forward in fold-2 (space-to-depth) execution.

Numerically identical to `vnet_apply` (same params pytree, same outputs,
tested to f32 tolerance) but the two small-channel levels — L0
(C=n_filters, full resolution) and L1 (C=2*n_filters, half resolution) —
run FOLDED so every tensor XLA touches has >= 128 effective lanes
(see ops/folding.py; the plain NDHWC forms are lane-padded up to 8x).

The phase choreography differs from the folded U-Net because V-Net's
blocks have ODD conv counts (enc0/dec3 are single 3^3 convs — reference
VNet.py:150,174) and resample with strided / transposed 2^3 convs
instead of pooling (VNet.py:45-84). Folding the INPUT to phase-1
(`fold2_phase1`) makes every phase line up with zero repacking:

  input fold (phase-1) -> enc0 conv (1->0) -> s0 at PHASE-0
  -> strided 2^3 conv == one dense matmul per phase-0 block -> L1
  -> enc1 convs (0->1->0) -> s1 at PHASE-0 -> strided conv -> plain L2+
  ... plain middle (C >= 64) ...
  transposed 2^3 conv emits whole 2x2x2 blocks == folded phase-0 L1
  -> (+ s1) -> dec2 convs (0->1->0) -> transposed conv -> (+ s0)
  -> dec3 conv (0->1) -> heads on phase-1 -> unfold once.

Both resamplers are structurally DENSE in the folded domain (one
(8Ci, Co) / (Ci, 8Co) matmul), so unlike the 3^3 taps there is zero
redundant-FLOP overhead. BatchNorm runs folded with true-voxel-count
statistics and factored phase-1 masks (ops/folding.batch_norm_folded).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import layers
from .vnet import (
    _DEC_STAGES,
    _ENC_STAGES,
    VNetConfig,
    _block_apply,
    _down_apply,
    _up_apply,
    vnet_projection,
)
from ..ops.folding import (
    batch_norm_folded,
    conv1x1_folded,
    fold2_phase1,
    folded_conv3,
    phase1_lane_masks,
    strided_conv2_folded,
    transposed_conv2_to_folded,
    unfold2,
    unfold2_phase1,
)

Params = dict


def _folded_stack(p: Params, s: Params, x, n_stages: int, *, grid, n_valid, train, cd,
                  start_phase: int = 0):
    """n_stages x [3^3 conv -> BN -> ReLU] on folded data.

    x: (B, *G, 8Ci) at `start_phase`; each conv toggles the phase.
    `grid` is the PHASE-0 grid — phase-1 tensors live at grid+1 per
    axis. Output phase = start_phase XOR (n_stages odd): enc0 starts at
    phase-1 (the fold2_phase1 input) and ends phase-0; dec3 starts at
    phase-0 and ends phase-1 (the caller unfolds with unfold2_phase1)."""
    new_state = {}
    phase = start_phase
    for i in range(n_stages):
        to_phase = 1 - phase
        co = p[f"conv{i}"]["w"].shape[4]
        h = folded_conv3(x, p[f"conv{i}"]["w"], p[f"conv{i}"].get("b"),
                         to_phase=to_phase, compute_dtype=cd)
        if to_phase == 1:
            g = tuple(g_ + 1 for g_ in grid)
            masks = phase1_lane_masks(g, co)
        else:
            masks = None
        h, new_state[f"bn{i}"] = batch_norm_folded(
            p[f"bn{i}"], s[f"bn{i}"], h, n_valid, masks, train=train
        )
        x = jax.nn.relu(h)
        phase = to_phase
    return x, new_state


def vnet_apply_folded(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    cfg: VNetConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    with_projection: bool = True,
):
    """x: (B, D1, D2, D3, C), spatial dims divisible by 16.
    Returns ((sdf, seg_logits, features), new_state), outputs f32 —
    the folded twin of vnet.vnet_apply."""
    cd = cfg.compute_dtype
    inner_cfg = dataclasses.replace(cfg, layout="NDHWC")
    B, D, H, W, _ = x.shape
    assert D % 16 == 0 and H % 16 == 0 and W % 16 == 0, (D, H, W)
    if train and rng is not None:
        d1_key, d2_key = jax.random.split(rng)
    else:
        d1_key = d2_key = None

    g0 = (D // 2, H // 2, W // 2)     # L0 folded grid (phase-0)
    g1 = tuple(g // 2 for g in g0)    # L1 folded grid
    n0 = D * H * W
    n1 = n0 // 8
    new_state: Params = {}

    # --- folded encoder: L0 (enc0 + down0) and L1 (enc1 + down1) ---
    h = fold2_phase1(x)  # phase-1, zeros on the boundary planes
    s0, new_state["enc0"] = _folded_stack(
        params["enc0"], state["enc0"], h, _ENC_STAGES[0],
        grid=g0, n_valid=n0, train=train, cd=cd, start_phase=1,
    )
    h = strided_conv2_folded(s0, params["down0"]["conv"]["w"],
                             params["down0"]["conv"].get("b"), compute_dtype=cd)
    h, bn_s = batch_norm_folded(params["down0"]["bn"], state["down0"]["bn"],
                                h, n1, train=train)
    new_state["down0"] = {"bn": bn_s}
    h = jax.nn.relu(h)
    s1, new_state["enc1"] = _folded_stack(
        params["enc1"], state["enc1"], h, _ENC_STAGES[1],
        grid=g1, n_valid=n1, train=train, cd=cd,
    )
    h = strided_conv2_folded(s1, params["down1"]["conv"]["w"],
                             params["down1"]["conv"].get("b"),
                             compute_dtype=cd, fold_output=False)
    h, bn_s = layers.batch_norm(params["down1"]["bn"], state["down1"]["bn"],
                                h, train=train)
    new_state["down1"] = {"bn": bn_s}
    h = jax.nn.relu(h)  # (B, *g1, 4f) unfolded L2

    # --- plain middle: enc2..enc4 (+down2/3), dec0..dec1 (+up0/1) ---
    skips = []
    for lvl in (2, 3, 4):
        h, new_state[f"enc{lvl}"] = _block_apply(
            params[f"enc{lvl}"], state[f"enc{lvl}"], h, _ENC_STAGES[lvl],
            train=train, cd=cd,
        )
        if lvl < 4:
            skips.append(h)
            h, new_state[f"down{lvl}"] = _down_apply(
                params[f"down{lvl}"], state[f"down{lvl}"], h, train=train, cd=cd
            )
    center = layers.dropout(h, cfg.dropout_rate, d1_key, train)

    h = center
    for lvl in (0, 1):  # up from L4 -> L3 -> L2
        h, new_state[f"up{lvl}"] = _up_apply(
            params[f"up{lvl}"], state[f"up{lvl}"], h, train=train, cd=cd
        )
        h = h + skips[1 - lvl].astype(h.dtype)
        h, new_state[f"dec{lvl}"] = _block_apply(
            params[f"dec{lvl}"], state[f"dec{lvl}"], h, _DEC_STAGES[lvl],
            train=train, cd=cd,
        )

    # --- folded decoder: up2/dec2 (L1), up3/dec3 (L0) ---
    h = transposed_conv2_to_folded(h, params["up2"]["conv"]["w"],
                                   params["up2"]["conv"].get("b"), compute_dtype=cd)
    h, bn_s = batch_norm_folded(params["up2"]["bn"], state["up2"]["bn"],
                                h, n1, train=train)
    new_state["up2"] = {"bn": bn_s}
    h = jax.nn.relu(h) + s1.astype(h.dtype)
    h, new_state["dec2"] = _folded_stack(
        params["dec2"], state["dec2"], h, _DEC_STAGES[2],
        grid=g1, n_valid=n1, train=train, cd=cd,
    )

    h = transposed_conv2_to_folded(unfold2(h), params["up3"]["conv"]["w"],
                                   params["up3"]["conv"].get("b"), compute_dtype=cd)
    h, bn_s = batch_norm_folded(params["up3"]["bn"], state["up3"]["bn"],
                                h, n0, train=train)
    new_state["up3"] = {"bn": bn_s}
    h = jax.nn.relu(h) + s0.astype(h.dtype)
    h, new_state["dec3"] = _folded_stack(
        params["dec3"], state["dec3"], h, _DEC_STAGES[3],
        grid=g0, n_valid=n0, train=train, cd=cd,
    )  # ends PHASE-1 at grid g0+1 (single conv, 0->1... see below)
    h = layers.dropout(h, cfg.dropout_rate, d2_key, train)

    def head(p):
        y = conv1x1_folded(h, p["w"], p.get("b"), compute_dtype=cd)
        return unfold2_phase1(y).astype(jnp.float32)

    seg = head(params["out_conv"])
    sdf = jnp.tanh(head(params["out_conv_sdf"]))

    if not with_projection:
        new_state["projection"] = state["projection"]
        return (sdf, seg, None), new_state

    features, new_state["projection"] = vnet_projection(
        params, state, center, inner_cfg, train=train
    )
    return (sdf, seg, features), new_state
