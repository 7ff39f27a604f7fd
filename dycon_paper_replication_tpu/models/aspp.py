"""3-D Atrous Spatial Pyramid Pooling (optional bottleneck refiner).

Parity target: /root/reference/code/networks/assp.py:28-85. Five parallel
branches over the bottleneck — 1^3 conv, three dilated 3^3 convs
(dilations 6/12/18 at output_stride 16, 12/24/36 at 8), and a global
average pool branch — concatenated and fused by a 1^3 conv + BN + ReLU +
dropout(0.5). All convs are bias-free with BatchNorm.

Quirk kept: the reference skips the BN after the pooled branch when the
batch has a single element (assp.py:64-65); we mirror that statically
via the batch dimension.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import layers
from ..ops.resize import trilinear_resize, global_avg_pool

Params = dict[str, Any]


def _dilations(output_stride: int) -> tuple[int, ...]:
    if output_stride == 16:
        return (1, 6, 12, 18)
    if output_stride == 8:
        return (1, 12, 24, 36)
    raise NotImplementedError(f"output_stride {output_stride}")


def aspp3d_init(
    key: jax.Array, inplanes: int, outplanes: int, output_stride: int = 16
) -> tuple[Params, Params]:
    dilations = _dilations(output_stride)
    keys = jax.random.split(key, 8)
    params: Params = {}
    state: Params = {}
    for i, dil in enumerate(dilations):
        kernel = (1, 1, 1) if i == 0 else (3, 3, 3)
        params[f"aspp{i+1}"] = {
            "conv": layers.conv3d_init(keys[i], inplanes, outplanes, kernel, use_bias=False),
        }
        bn_p, bn_s = layers.batch_norm_init(outplanes)
        params[f"aspp{i+1}"]["bn"] = bn_p
        state[f"aspp{i+1}"] = bn_s
    params["pool_conv"] = layers.conv3d_init(keys[4], inplanes, outplanes, (1, 1, 1), use_bias=False)
    bn_p, bn_s = layers.batch_norm_init(outplanes)
    params["pool_bn"], state["pool_bn"] = bn_p, bn_s
    params["fuse_conv"] = layers.conv3d_init(keys[5], outplanes * 5, outplanes, (1, 1, 1), use_bias=False)
    bn_p, bn_s = layers.batch_norm_init(outplanes)
    params["fuse_bn"], state["fuse_bn"] = bn_p, bn_s
    return params, state


def aspp3d_apply(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    output_stride: int = 16,
) -> tuple[jnp.ndarray, Params]:
    dilations = _dilations(output_stride)
    new_state = dict(state)
    branches = []
    for i, dil in enumerate(dilations):
        name = f"aspp{i+1}"
        pad = "SAME" if i > 0 else "VALID"
        h = layers.conv3d(params[name]["conv"], x, padding=pad, dilation=(dil, dil, dil))
        h, new_state[name] = layers.batch_norm(params[name]["bn"], state[name], h, train=train)
        branches.append(jax.nn.relu(h))

    pooled = global_avg_pool(x)
    pooled = layers.conv3d(params["pool_conv"], pooled)
    if x.shape[0] > 1:
        pooled, new_state["pool_bn"] = layers.batch_norm(
            params["pool_bn"], state["pool_bn"], pooled, train=train
        )
    pooled = jax.nn.relu(pooled)
    pooled = trilinear_resize(pooled, branches[-1].shape[1:4], align_corners=True)
    branches.append(pooled)

    h = jnp.concatenate(branches, axis=-1)
    h = layers.conv3d(params["fuse_conv"], h)
    h, new_state["fuse_bn"] = layers.batch_norm(params["fuse_bn"], state["fuse_bn"], h, train=train)
    h = jax.nn.relu(h)
    return layers.dropout(h, 0.5, rng, train), new_state
