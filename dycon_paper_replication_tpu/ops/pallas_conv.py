"""Pallas TPU kernel: packed-lane 3x3x3 convolution (NDHWC).

Why: XLA stores channels-last tensors with the channel axis in the lane
dimension, padded to 128. A (B,96,96,96,16) activation therefore
occupies and moves 8x its logical bytes, and convs contract over a
16-wide K — both starve the MXU. This kernel instead views the array as
(B, D, H, W/p, p*C) — a FREE reshape of the same dense buffer, with
p chosen so p*C is a multiple of 128 — and computes the convolution as
banded matmuls over fully-utilized 128-lane tiles:

    y[d, h, wg] = sum_{dz,dy} [  x[d+dz, h+dy, wg]   @ W_mid[dz,dy]
                               + x[d+dz, h+dy, wg-1][..., -Cin:] @ W_lo[dz,dy]
                               + x[d+dz, h+dy, wg+1][..., :Cin]  @ W_hi[dz,dy] ]

where W_mid is the (p*Cin, p*Cout) block-banded matrix carrying all
within-group W taps (dx = j_in - j_out in {-1,0,1}), and W_lo / W_hi
carry the taps that cross the packed-group boundary. All accumulation
is f32 on the MXU (preferred_element_type); inputs stream as bf16.

Grid: one program per (batch, depth-plane). Halos in D/H/W come from a
zero-padded copy of the packed input, passed three times with
depth-shifted index maps (no data duplication — same buffer).

SAME padding, stride 1, kernel 3^3 only (the only conv the UNet3D /
VNet bodies use). 1^3 head convs and the Cin=1 stem stay on XLA.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guarded for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def choose_pack(c_in: int, width: int) -> int | None:
    """Smallest p in {1,2,4,8,16} with p*c_in % 128 == 0 and p | width.
    None -> no valid packing (caller falls back to XLA conv)."""
    for p in (1, 2, 4, 8, 16):
        if (p * c_in) % 128 == 0 and width % p == 0:
            return p
    return None


def pack_weights(w: jnp.ndarray, p: int, dtype=jnp.bfloat16):
    """w: (3,3,3,Cin,Cout) -> (W_mid (9, p*Cin, p*Cout),
    W_lo (9, Cin, p*Cout), W_hi (9, Cin, p*Cout))."""
    _, _, _, c_in, c_out = w.shape
    w9 = w.reshape(9, 3, c_in, c_out)
    jj = jnp.arange(p)
    dx = jj[:, None] - jj[None, :]  # j_in - j_out
    sel = (jnp.abs(dx) <= 1).astype(w.dtype)  # (p, p)
    gathered = w9[:, jnp.clip(dx + 1, 0, 2)]  # (9, p, p, Cin, Cout)
    w_mid = gathered * sel[None, :, :, None, None]
    w_mid = w_mid.transpose(0, 1, 3, 2, 4).reshape(9, p * c_in, p * c_out)

    w_lo = jnp.zeros((9, c_in, p, c_out), w.dtype)
    w_lo = w_lo.at[:, :, 0, :].set(w9[:, 0])  # prev group last lane -> j_out 0, dx=-1
    w_hi = jnp.zeros((9, c_in, p, c_out), w.dtype)
    w_hi = w_hi.at[:, :, p - 1, :].set(w9[:, 2])  # next group first lane -> j_out p-1, dx=+1
    return (
        w_mid.astype(dtype),
        w_lo.reshape(9, c_in, p * c_out).astype(dtype),
        w_hi.reshape(9, c_in, p * c_out).astype(dtype),
    )


def _kernel(x_m1, x_0, x_p1, w_mid, w_lo, w_hi, bias, out_ref, *, H, Wg, c_in, n_out):
    rows = H * Wg
    acc = jnp.zeros((rows, n_out), jnp.float32)
    for dz, xz in enumerate((x_m1, x_0, x_p1)):
        for dy in range(3):
            k = 3 * dz + dy
            xs = xz[0, 0, dy : dy + H]  # (H, Wg+2, L)
            mid = xs[:, 1 : 1 + Wg, :].reshape(rows, -1)
            acc += jnp.dot(mid, w_mid[k], preferred_element_type=jnp.float32)
            lo = xs[:, 0:Wg, -c_in:].reshape(rows, c_in)
            acc += jnp.dot(lo, w_lo[k], preferred_element_type=jnp.float32)
            hi = xs[:, 2 : 2 + Wg, :c_in].reshape(rows, c_in)
            acc += jnp.dot(hi, w_hi[k], preferred_element_type=jnp.float32)
    acc = acc + bias[:][None, :].astype(jnp.float32)
    out_ref[0, 0] = acc.reshape(H, Wg, n_out).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("p", "out_dtype", "interpret")
)
def packed_conv3d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    p: int,
    out_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """3^3 SAME conv via the packed-lane Pallas kernel.

    x: (B, D, H, W, Cin) any float dtype; w: (3,3,3,Cin,Cout); b: (Cout,).
    Returns (B, D, H, W, Cout) in out_dtype.
    """
    B, D, H, W, c_in = x.shape
    c_out = w.shape[-1]
    assert W % p == 0, (W, p)
    Wg = W // p
    L = p * c_in
    N = p * c_out

    xp = x.astype(jnp.bfloat16).reshape(B, D, H, Wg, L)
    xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w_mid, w_lo, w_hi = pack_weights(w, p)
    bias = jnp.tile(b, p) if b is not None else jnp.zeros((N,), jnp.float32)

    kern = functools.partial(_kernel, H=H, Wg=Wg, c_in=c_in, n_out=N)

    def x_spec(dz):
        return pl.BlockSpec(
            (1, 1, H + 2, Wg + 2, L), lambda b_, d_, dz=dz: (b_, d_ + dz, 0, 0, 0)
        )

    y = pl.pallas_call(
        kern,
        grid=(B, D),
        in_specs=[
            x_spec(0),
            x_spec(1),
            x_spec(2),
            pl.BlockSpec((9, L, N), lambda b_, d_: (0, 0, 0)),
            pl.BlockSpec((9, c_in, N), lambda b_, d_: (0, 0, 0)),
            pl.BlockSpec((9, c_in, N), lambda b_, d_: (0, 0, 0)),
            pl.BlockSpec((N,), lambda b_, d_: (0,)),
        ],
        out_specs=pl.BlockSpec((1, 1, H, Wg, N), lambda b_, d_: (b_, d_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, H, Wg, N), out_dtype),
        interpret=interpret,
    )(xp, xp, xp, w_mid, w_lo, w_hi, bias)
    return y.reshape(B, D, H, W, c_out)
