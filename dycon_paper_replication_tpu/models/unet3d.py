"""Functional 3D U-Net with three heads (DyCON's active model).

Architecture (parity target: reference UNet3D,
/root/reference/code/networks/UNet3D_contrastive.py:207-322, re-designed
as a functional NDHWC program — not a translation):

  encoder: 4 x [UnetConv3 -> 2x2x2 maxpool], then a center UnetConv3 +
           dropout(0.3); UnetConv3 = 2 x (3^3 conv -> InstanceNorm -> ReLU)
  decoder: 4 x [trilinear 2x up -> concat skip -> UnetConv3], then
           dropout(0.3)
  heads:   `final` 1^3 conv + tanh        -> SDF-style regression map
           `out_conv2` 1^3 conv           -> segmentation logits
           projection: corner-aligned trilinear up(x scale_factor) of the
           (optionally ASPP-refined) bottleneck -> 1^3 conv(512) -> BN ->
           ReLU -> 1^3 conv(256) -> BN    -> contrastive features
  filters: [64,128,256,512,1024] // feature_scale (default 4 -> 16..256)

Channels-last everywhere; convs hit the MXU via XLA's NDHWC emitter, all
norm/activation chains fuse into the conv epilogues. `compute_dtype`
(default bf16 on TPU for speed, f32 for parity tests) only affects conv
inputs; accumulations stay f32 via preferred_element_type.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from . import layers
from .aspp import aspp3d_apply, aspp3d_init
from ..ops.resize import trilinear_resize, max_pool_2x, upsample2x

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 1
    n_classes: int = 2
    feature_scale: int = 4
    scale_factor: int = 2  # projection-head upsample factor (2, 4, or 8)
    use_aspp: bool = False
    dropout_rate: float = 0.3
    proj_hidden: int = 512
    proj_out: int = 256
    compute_dtype: Any = jnp.float32
    # internal tensor layout: "NDHWC", "NCDHW" or "folded". On TPU,
    # NCDHW puts the W axis in the 128-lane dim (1.33x pad) instead of
    # the C<128 axis (up to 8x pad) — measured ~2x faster convs on v5e.
    # "folded" runs the small-channel levels in fold-2 space-to-depth
    # execution (ops/folding.py) — fastest measured. The EXTERNAL
    # interface (inputs and all three outputs) is channels-last either way.
    layout: str = "NDHWC"

    @property
    def filters(self) -> tuple[int, ...]:
        return tuple(f // self.feature_scale for f in (64, 128, 256, 512, 1024))


def _conv_block_init(key: jax.Array, in_ch: int, out_ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": layers.conv3d_init(k1, in_ch, out_ch),
        "conv2": layers.conv3d_init(k2, out_ch, out_ch),
    }


def _conv_block(params: Params, x: jnp.ndarray, cfg: "UNet3DConfig") -> jnp.ndarray:
    """UnetConv3: two (conv3^3 -> InstanceNorm -> ReLU) stages."""
    ca = 1 if cfg.layout == "NCDHW" else -1
    kw = dict(compute_dtype=cfg.compute_dtype, data_format=cfg.layout)
    x = layers.conv3d(params["conv1"], x, **kw)
    x = jax.nn.relu(layers.instance_norm(x, channel_axis=ca))
    x = layers.conv3d(params["conv2"], x, **kw)
    return jax.nn.relu(layers.instance_norm(x, channel_axis=ca))


def init_unet3d(key: jax.Array, cfg: UNet3DConfig) -> tuple[Params, Params]:
    """Build (params, state) pytrees. `state` holds BatchNorm running stats
    (projection head and, if enabled, ASPP)."""
    f = cfg.filters
    keys = jax.random.split(key, 16)
    params: Params = {
        "conv1": _conv_block_init(keys[0], cfg.in_channels, f[0]),
        "conv2": _conv_block_init(keys[1], f[0], f[1]),
        "conv3": _conv_block_init(keys[2], f[1], f[2]),
        "conv4": _conv_block_init(keys[3], f[2], f[3]),
        "center": _conv_block_init(keys[4], f[3], f[4]),
        "up_concat4": _conv_block_init(keys[5], f[4] + f[3], f[3]),
        "up_concat3": _conv_block_init(keys[6], f[3] + f[2], f[2]),
        "up_concat2": _conv_block_init(keys[7], f[2] + f[1], f[1]),
        "up_concat1": _conv_block_init(keys[8], f[1] + f[0], f[0]),
        "final": layers.conv3d_init(keys[9], f[0], cfg.n_classes, (1, 1, 1)),
        "out_conv2": layers.conv3d_init(keys[10], f[0], cfg.n_classes, (1, 1, 1)),
    }
    state: Params = {}

    pb1, pbs1 = layers.batch_norm_rand_init(keys[11], cfg.proj_hidden)
    pb2, pbs2 = layers.batch_norm_rand_init(keys[12], cfg.proj_out)
    params["projection"] = {
        "conv1": layers.conv3d_init(keys[13], f[4], cfg.proj_hidden, (1, 1, 1)),
        "bn1": pb1,
        "conv2": layers.conv3d_init(keys[14], cfg.proj_hidden, cfg.proj_out, (1, 1, 1)),
        "bn2": pb2,
    }
    state["projection"] = {"bn1": pbs1, "bn2": pbs2}

    if cfg.use_aspp:
        aspp_p, aspp_s = aspp3d_init(keys[15], f[4], f[4])
        params["aspp"] = aspp_p
        state["aspp"] = aspp_s
    return params, state


def projection_head(
    params: Params,
    state: Params,
    center: jnp.ndarray,
    cfg: UNet3DConfig,
    *,
    train: bool,
    aspp_key: jax.Array | None,
) -> tuple[jnp.ndarray, Params]:
    """ASPP (optional) + corner-aligned upsample + conv-BN projection.

    `center` is in cfg.layout format; returns (features f32 channels-last,
    state updates dict with 'projection' and optionally 'aspp')."""
    cd = cfg.compute_dtype
    cf = cfg.layout == "NCDHW"
    ca = 1 if cf else -1
    spatial_axes = (2, 3, 4) if cf else (1, 2, 3)
    updates: Params = {}

    proj_in = center
    if cfg.use_aspp:
        if cf:
            proj_in = jnp.moveaxis(proj_in, 1, -1)
        proj_in, updates["aspp"] = aspp3d_apply(
            params["aspp"], state["aspp"], proj_in, train=train, rng=aspp_key
        )
        if cf:
            proj_in = jnp.moveaxis(proj_in, -1, 1)

    target = tuple(proj_in.shape[a] * cfg.scale_factor for a in spatial_axes)
    proj = trilinear_resize(proj_in, target, align_corners=True, spatial_axes=spatial_axes)
    proj = layers.conv3d(params["projection"]["conv1"], proj, compute_dtype=cd,
                         data_format=cfg.layout)
    proj, bn1_state = layers.batch_norm(
        params["projection"]["bn1"], state["projection"]["bn1"], proj,
        train=train, channel_axis=ca,
    )
    proj = jax.nn.relu(proj)
    proj = layers.conv3d(params["projection"]["conv2"], proj, compute_dtype=cd,
                         data_format=cfg.layout)
    features, bn2_state = layers.batch_norm(
        params["projection"]["bn2"], state["projection"]["bn2"], proj,
        train=train, channel_axis=ca,
    )
    updates["projection"] = {"bn1": bn1_state, "bn2": bn2_state}
    if cf:
        features = jnp.moveaxis(features, 1, -1)
    return features.astype(jnp.float32), updates


def unet3d_apply(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    cfg: UNet3DConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    with_projection: bool = True,
) -> tuple[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], Params]:
    """Forward pass.

    x: (B, D1, D2, D3, in_channels), spatial dims divisible by 16.
    Returns ((sdf, seg_logits, features), new_state); all outputs f32,
    features NOT yet normalized (trainer normalizes per-location).
    `with_projection=False` skips the contrastive head (inference path —
    sliding-window eval only consumes seg_logits); features is then None.
    """
    if cfg.layout == "folded":
        from .unet3d_folded import unet3d_apply_folded

        return unet3d_apply_folded(
            params, state, x, cfg, train=train, rng=rng, with_projection=with_projection
        )
    cd = cfg.compute_dtype
    cf = cfg.layout == "NCDHW"
    ca = 1 if cf else -1
    spatial_axes = (2, 3, 4) if cf else (1, 2, 3)
    if train and rng is not None:
        d1_key, d2_key, aspp_key = jax.random.split(rng, 3)
    else:
        d1_key = d2_key = aspp_key = None

    def head_conv(p, v):
        y = layers.conv3d(p, v, compute_dtype=cd, data_format=cfg.layout)
        if cf:
            y = jnp.moveaxis(y, 1, -1)  # back to channels-last
        return y.astype(jnp.float32)

    skips = []
    h = jnp.moveaxis(x, -1, 1) if cf else x
    for name in ("conv1", "conv2", "conv3", "conv4"):
        h = _conv_block(params[name], h, cfg)
        skips.append(h)
        h = max_pool_2x(h, data_format=cfg.layout)
    center = _conv_block(params["center"], h, cfg)
    center = layers.dropout(center, cfg.dropout_rate, d1_key, train)

    h = center
    for name, skip in zip(("up_concat4", "up_concat3", "up_concat2", "up_concat1"), skips[::-1]):
        up = upsample2x(h, spatial_axes=spatial_axes)
        h = jnp.concatenate([skip.astype(up.dtype), up], axis=ca)
        h = _conv_block(params[name], h, cfg)
    h = layers.dropout(h, cfg.dropout_rate, d2_key, train)

    new_state = dict(state)
    if not with_projection:
        sdf = jnp.tanh(head_conv(params["final"], h))
        seg = head_conv(params["out_conv2"], h)
        return (sdf, seg, None), new_state

    features, updates = projection_head(
        params, state, center, cfg, train=train, aspp_key=aspp_key
    )
    new_state.update(updates)

    sdf = jnp.tanh(head_conv(params["final"], h))
    seg = head_conv(params["out_conv2"], h)
    return (sdf, seg, features), new_state


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
