"""Low-level functional layers for NDHWC 3D volumes.

Parameters are plain nested dicts (pytrees); every layer is a pure
function `apply(params, x, ...)` plus an `init(key, ...)` constructor.
Conv kernels are stored DHWIO — the layout XLA's TPU conv emitter wants.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

_CONV_DN = ("NDHWC", "DHWIO", "NDHWC")


def conv3d_init(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: tuple[int, int, int] = (3, 3, 3),
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Kaiming-normal (fan_in, ReLU gain) kernel + torch-default uniform bias.

    Matches the reference init scheme (networks_other.py:40-48): kernel
    std = sqrt(2 / fan_in); bias ~ U(±1/sqrt(fan_in)) (torch Conv3d default,
    untouched by the reference's init pass).
    """
    k_key, b_key = jax.random.split(key)
    fan_in = in_ch * math.prod(kernel)
    w = jax.random.normal(k_key, kernel + (in_ch, out_ch), dtype) * math.sqrt(2.0 / fan_in)
    p: Params = {"w": w}
    if use_bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(b_key, (out_ch,), dtype, -bound, bound)
    return p


def conv3d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: tuple[int, int, int] = (1, 1, 1),
    padding: str | tuple = "SAME",
    dilation: tuple[int, int, int] = (1, 1, 1),
    compute_dtype=None,
    data_format: str = "NDHWC",
) -> jnp.ndarray:
    """3-D convolution over (B, D1, D2, D3, C) or (B, C, D1, D2, D3).

    Layout note (measured on v5e): XLA puts the minor-most dim in the
    128-lane axis. With C < 128 the NDHWC form is padded up to 8x in
    memory/bandwidth; NCDHW (W in lanes) runs the same conv ~2x faster
    for this network's channel counts. Kernels are stored DHWIO either
    way; only the IO dimension strings change.
    """
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # In reduced precision the conv emits its own dtype (the TPU MXU still
    # accumulates f32 internally before rounding); requesting an f32
    # preferred_element_type there would (a) double the HBM traffic of
    # every downstream op and (b) break the conv transpose rule under
    # jax.grad (f32 cotangent against a bf16 operand).
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    dn = (data_format, "DHWIO", data_format)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=dn,
        preferred_element_type=preferred,
    )
    if "b" in params:
        b = params["b"].astype(y.dtype)
        y = y + (b[:, None, None, None] if data_format == "NCDHW" else b)
    return y


def conv_transpose3d_init(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: tuple[int, int, int] = (2, 2, 2),
    dtype=jnp.float32,
) -> Params:
    """Transposed-conv kernel (DHWIO, I=in, O=out) + zero bias."""
    k_key, b_key = jax.random.split(key)
    fan_in = in_ch * math.prod(kernel)
    w = jax.random.normal(k_key, kernel + (in_ch, out_ch), dtype) * math.sqrt(2.0 / fan_in)
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": w, "b": jax.random.uniform(b_key, (out_ch,), dtype, -bound, bound)}


def conv_transpose3d(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: tuple[int, int, int] = (2, 2, 2),
    compute_dtype=None,
    data_format: str = "NDHWC",
) -> jnp.ndarray:
    """Transposed 3-D convolution; kernel 2^3 stride 2 doubles every
    spatial dim (torch ConvTranspose3d(k=2, s=2) semantics)."""
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_transpose(
        x,
        w,
        strides=stride,
        padding="VALID",
        dimension_numbers=(data_format, "DHWIO", data_format),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    b = params["b"].astype(y.dtype)
    y = y + (b[:, None, None, None] if data_format == "NCDHW" else b)
    return y


def instance_norm(x: jnp.ndarray, eps: float = 1e-5, channel_axis: int = -1) -> jnp.ndarray:
    """Per-sample, per-channel normalization over the spatial axes.

    No affine transform and no running stats (torch InstanceNorm3d
    defaults, which the reference's conv blocks rely on — see
    networks/utils.py:104-110); train and eval behave identically.
    Stats are taken in float32 for stability under bf16 compute.
    """
    ca = channel_axis % x.ndim
    spatial = tuple(a for a in range(1, x.ndim) if a != ca)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=spatial, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=spatial, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def batch_norm_init(ch: int, dtype=jnp.float32) -> tuple[Params, Params]:
    """BatchNorm params (scale ~ N(1, 0.02), bias 0 — reference init) and
    running-stat state (mean 0, var 1)."""
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), jnp.float32), "var": jnp.ones((ch,), jnp.float32)}
    return params, state


def batch_norm_rand_init(key: jax.Array, ch: int, dtype=jnp.float32) -> tuple[Params, Params]:
    params = {
        "scale": 1.0 + 0.02 * jax.random.normal(key, (ch,), dtype),
        "bias": jnp.zeros((ch,), dtype),
    }
    state = {"mean": jnp.zeros((ch,), jnp.float32), "var": jnp.ones((ch,), jnp.float32)}
    return params, state


def batch_norm(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    channel_axis: int = -1,
) -> tuple[jnp.ndarray, Params]:
    """Channel batch norm over an NDHWC or NCDHW volume.

    Train: normalize with batch stats (biased var), update running stats
    with the unbiased var (torch convention). Eval: use running stats.
    Returns (y, new_state).
    """
    ca = channel_axis % x.ndim
    reduce_axes = tuple(a for a in range(x.ndim) if a != ca)
    bshape = [1] * x.ndim
    bshape[ca] = x.shape[ca]

    def bc(v):
        return v.reshape(bshape)

    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.mean(jnp.square(xf - bc(mean)), axis=reduce_axes)
        n = x.size // x.shape[ca]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x.astype(jnp.float32) - bc(mean)) * jax.lax.rsqrt(bc(var) + eps)
    y = y * bc(params["scale"].astype(jnp.float32)) + bc(params["bias"].astype(jnp.float32))
    return y.astype(x.dtype), new_state


def dropout(x: jnp.ndarray, rate: float, key: jax.Array | None, train: bool) -> jnp.ndarray:
    """Inverted dropout (scale by 1/keep at train time)."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
