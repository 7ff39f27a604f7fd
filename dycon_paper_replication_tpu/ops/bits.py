"""Device-side bit packing for binary masks crossing the host link.

A thresholded label map is 1 bit of information per voxel; shipping it
as uint8 pays 8x the link bytes. On this image's relay link (25-130
MB/s) and on any production host link, packing the D2H payload on
device is nearly free compute for an 8x transfer cut. Used by the
train step's `pred_fg_bits` diagnostic output and the sliding-window
engine's label return.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def packbits_le(x: jnp.ndarray) -> jnp.ndarray:
    """Pack a 0/1 float/int/bool array into uint8 along the LAST axis,
    little-endian bit order (`unpackbits_le` / numpy
    `np.unpackbits(..., axis=-1, bitorder="little")` invert it). The
    last axis pads up to a byte multiple; consumers slice back to the
    true extent."""
    w = x.shape[-1]
    pad = (-w) % 8
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = x.reshape(x.shape[:-1] + (-1, 8)).astype(jnp.int32)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    return jnp.sum(xb * weights, axis=-1).astype(jnp.uint8)


def unpackbits_le(packed: np.ndarray, last_dim: int) -> np.ndarray:
    """Host-side inverse of `packbits_le`: uint8 (..., ceil(n/8)) ->
    uint8 0/1 (..., last_dim)."""
    bits = np.unpackbits(packed, axis=-1, bitorder="little")
    return bits[..., :last_dim]
