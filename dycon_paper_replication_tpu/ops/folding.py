"""Fold-2 (space-to-depth) execution engine for small-channel 3-D convs.

Why: XLA stores NDHWC tensors with C in the 128-lane dimension, so the
U-Net's C=16/32 levels are padded up to 8x in memory, bandwidth and MXU
contraction depth — the dominant inefficiency of this network on TPU
(measured round 1: the 16->16 conv at 96^3 runs at ~5% MFU). Folding a
2x2x2 spatial block into the channel axis gives tensors with 8*C >= 128
channels that use every lane.

The key identity: a 3^3 SAME conv on fold-2 data is a dense 2^3-tap conv
over the folded grid, provided input and output use ALTERNATING fold
phases:

  phase-0 block i of a length-n axis holds positions (2i, 2i+1),
      grid n/2;
  phase-1 block i holds positions (2i-1, 2i), grid n/2 + 1 (positions
      -1 and n are zero padding).

  For y[o] = sum_{d in -1..1} w[d] * x[o+d] (x zero-padded):
    phase-0 -> phase-1: 2 taps over the folded axis, padding (1, 1);
    phase-1 -> phase-0: 2 taps, padding VALID;
  and BOTH directions use the same folded tap matrices
    M[t][s, o] = w[2t + s - o - 1]   (zero when |2t+s-o-1| > 1).

Each UnetConv3 block (two convs) therefore maps phase-0 -> phase-0 with
no repacking between its convs; 2x2x2 max-pool windows coincide exactly
with phase-0 blocks, so pooling consumes the fold for free. Per-conv
FLOPs grow by 64/27 (the dense 2^3 taps cover a 4^3 input window of
which 3^3 is used), but lane utilization goes from C/128 to 1 — a large
net win for C in {16, 32}.

Numerics are EXACTLY those of the unfolded network: the two boundary
planes a phase-1 tensor carries (positions -1 and n) are masked to zero
before the next conv, and folded InstanceNorm divides by the true voxel
count, so folded == unfolded up to f32 reassociation (tested).

Everything here is plain differentiable XLA (no Pallas): the backward
of a folded conv is a folded conv, so the same engine accelerates
training. Lane order within a folded tensor is channel-major:
lane = c * 8 + (sd * 4 + sh * 2 + sw).

Parity target this accelerates: the reference 3^3 conv stacks in
/root/reference/code/networks/utils.py:99-124 (UnetConv3) as used by
UNet3D (/root/reference/code/networks/UNet3D_contrastive.py:207-322).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SUBS = 8  # 2*2*2 sub-positions per folded block


def fold2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 8C), phase-0, c-major lanes."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # (..., C, sd, sh, sw)
    return x.reshape(b, d // 2, h // 2, w // 2, c * _SUBS)


def unfold2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fold2: (B, g1, g2, g3, 8C) -> (B, 2g1, 2g2, 2g3, C)."""
    b, g1, g2, g3, l = x.shape
    c = l // _SUBS
    x = x.reshape(b, g1, g2, g3, c, 2, 2, 2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # (B, g1, sd, g2, sh, g3, sw, C)
    return x.reshape(b, 2 * g1, 2 * g2, 2 * g3, c)


def fold_conv3_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Ci, Co) -> folded taps (2, 2, 2, 8*Ci, 8*Co).

    Tap entry ((t_d,t_h,t_w), (ci,sd,sh,sw), (co,od,oh,ow)) equals
    w[delta_d+1, delta_h+1, delta_w+1, ci, co] with
    delta = 2t + s - o - 1 per dim, and 0 where any |delta| > 1. The
    same tensor serves both phase directions (see module docstring).
    """
    ci, co = w.shape[3], w.shape[4]
    t = jnp.arange(2)
    delta = 2 * t[:, None, None] + t[None, :, None] - t[None, None, :] - 1  # (t,s,o)
    valid = jnp.abs(delta) <= 1
    idx = jnp.clip(delta + 1, 0, 2)

    def ax(a, pos):  # broadcast a (2,2,2) dim-array into 9-axis position
        shape = [1] * 9
        shape[pos[0]] = shape[pos[1]] = shape[pos[2]] = 2
        return a.reshape([2, 2, 2]).transpose(0, 1, 2).reshape(
            [2 if i in pos else 1 for i in range(9)]
        )

    # axis order: (td, sd, od, th, sh, oh, tw, sw, ow)
    idx_d = ax(idx, (0, 1, 2))
    idx_h = ax(idx, (3, 4, 5))
    idx_w = ax(idx, (6, 7, 8))
    val = ax(valid, (0, 1, 2)) & ax(valid, (3, 4, 5)) & ax(valid, (6, 7, 8))
    wf = w[idx_d, idx_h, idx_w]  # (2,2,2,2,2,2,2,2,2, Ci, Co)
    wf = jnp.where(val[..., None, None], wf, 0)
    # -> (td, th, tw, Ci, sd, sh, sw, Co, od, oh, ow)
    wf = wf.transpose(0, 3, 6, 9, 1, 4, 7, 10, 2, 5, 8)
    return wf.reshape(2, 2, 2, ci * _SUBS, co * _SUBS)


def fold_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(C,) -> (8C,) c-major lane bias."""
    return jnp.repeat(b, _SUBS)


def phase1_mask(grid: tuple[int, int, int], dtype=jnp.float32) -> jnp.ndarray:
    """(1, G1, G2, G3, 1, 8) validity mask for a phase-1 tensor.

    Phase-1 block i of an axis holds positions (2i-1, 2i); sub 0 is the
    padding position -1 at block 0 and sub 1 is position n at the last
    block. Multiply a (..., C, 8)-reshaped tensor by this mask.
    """
    parts = []
    for g in grid:
        i = jnp.arange(g)
        v = jnp.stack([i > 0, i < g - 1], axis=-1)  # (g, 2): [sub0, sub1]
        parts.append(v)
    m = (
        parts[0][:, None, None, :, None, None]
        & parts[1][None, :, None, None, :, None]
        & parts[2][None, None, :, None, None, :]
    )  # (G1, G2, G3, 2, 2, 2)
    return m.reshape(1, *grid, 1, _SUBS).astype(dtype)


def apply_lane_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Multiply (..., 8C) folded tensor by a (..., 1, 8) sub-position mask."""
    b, g1, g2, g3, l = x.shape
    y = x.reshape(b, g1, g2, g3, l // _SUBS, _SUBS) * mask.astype(x.dtype)
    return y.reshape(b, g1, g2, g3, l)


def folded_conv3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    to_phase: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """One 3^3 SAME conv on folded data.

    x: (B, G1, G2, G3, 8Ci) folded input — phase-0 if to_phase == 1,
       phase-1 if to_phase == 0.
    w: UNFOLDED (3, 3, 3, Ci, Co) kernel (folded internally so param
       pytrees stay identical to the XLA path; gradients flow back
       through the linear fold).
    Returns the folded output: phase-1 at grid G+1 (padding (1,1)) or
    phase-0 at grid G-1 (VALID).

    Implementation dispatch: DYCON_FOLDED_CONV=pallas routes to the
    Pallas kernel (ops/folded_conv_pallas.py — VMEM tap reuse, no pad
    materialization, custom VJP) when tracing for TPU; default is the
    XLA 2^3-tap conv. Read at trace time, so set it before model jit.
    """
    import os

    if os.environ.get("DYCON_FOLDED_CONV") == "pallas":
        if jax.default_backend() == "tpu":
            from .folded_conv_pallas import folded_conv3_via_pallas

            return folded_conv3_via_pallas(
                x, w, b, to_phase=to_phase, compute_dtype=compute_dtype
            )
    wf = fold_conv3_weights(w)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wf = wf.astype(compute_dtype)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    pad = [(1, 1)] * 3 if to_phase == 1 else [(0, 0)] * 3
    y = jax.lax.conv_general_dilated(
        x,
        wf,
        window_strides=(1, 1, 1),
        padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=preferred,
    )
    if b is not None:
        y = y + fold_bias(b).astype(y.dtype)
    return y


def phase1_lane_masks(grid: tuple[int, int, int], c: int) -> list[jnp.ndarray]:
    """Factored phase-1 validity mask at full lane width.

    Returns three broadcastable f32 factors — shapes (1, G1, 1, 1, 8C),
    (1, 1, G2, 1, 8C), (1, 1, 1, G3, 8C) — whose product is the phase-1
    validity mask. Lane k holds channel k//8, sub-position s = k%8 with
    bits (sd, sh, sw) = (s//4, (s//2)%2, s%2); sub-bit 0 of an axis is
    the padding position -1 at block 0, bit 1 is position n at the last
    block. Multiplying the factors into elementwise ops lets XLA fuse
    the mask instead of materializing an O(G^3 * 8C) tensor (measured:
    the materialized-mask formulation cost ~7 ms per block at 48^3x128
    from layout-change copies).
    """
    sub = jnp.arange(_SUBS * c) % _SUBS
    bits = (sub // 4, (sub // 2) % 2, sub % 2)
    out = []
    for ax, (g, bit) in enumerate(zip(grid, bits)):
        i = jnp.arange(g)
        m = jnp.where(bit[None, :] == 0, (i > 0)[:, None], (i < g - 1)[:, None])
        shape = [1, 1, 1, 1, _SUBS * c]
        shape[1 + ax] = g
        out.append(m.astype(jnp.float32).reshape(shape))
    return out


def instance_norm_folded(
    x: jnp.ndarray,
    n_valid: int,
    masks: list[jnp.ndarray] | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """InstanceNorm over a folded (B, G1, G2, G3, 8C) tensor.

    Statistics are per (sample, channel) over all sub-positions and
    blocks, divided by the TRUE voxel count `n_valid` (phase-1 grids
    carry 2 boundary planes per axis holding out-of-range conv outputs
    that must not enter the stats). `masks` is the factored phase-1
    validity mask from `phase1_lane_masks`, or None for phase-0 tensors;
    when given, the output is also zeroed at the padding positions (as
    the next folded conv requires). Matches models.layers.instance_norm
    numerics (f32 stats, biased variance, no affine) up to the one-pass
    E[x^2]-E[x]^2 formulation.

    Layout note: all heavy ops keep the 8C lane axis intact — spatial
    reductions to (B, 8C), a tiny (B, C, 8) lane fold, and one fused
    elementwise normalize. Splitting lanes on the full tensor (reshape
    to (..., C, 8)) forces relayout copies and was ~6x slower.
    """
    b, g1, g2, g3, l = x.shape
    c = l // _SUBS
    xf = x.astype(jnp.float32)
    if masks is not None:
        for m in masks:
            xf = xf * m
    s1 = jnp.sum(xf, axis=(1, 2, 3))              # (B, 8C)
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2, 3))  # (B, 8C)
    mean = s1.reshape(b, c, _SUBS).sum(-1) / n_valid
    var = s2.reshape(b, c, _SUBS).sum(-1) / n_valid - jnp.square(mean)
    scale = jax.lax.rsqrt(var + eps)              # (B, C)
    scale_l = jnp.repeat(scale, _SUBS, axis=-1)[:, None, None, None, :]
    shift_l = jnp.repeat(mean * scale, _SUBS, axis=-1)[:, None, None, None, :]
    y = x.astype(jnp.float32) * scale_l - shift_l
    if masks is not None:
        for m in masks:
            y = y * m
    return y.astype(x.dtype)


def pool_consume_fold(x: jnp.ndarray) -> jnp.ndarray:
    """2^3 stride-2 max pool of a phase-0 folded tensor, UNFOLDED output.

    Pool windows coincide with phase-0 blocks, so the pool is a max over
    the 8 sub-positions: (B, G, G, G, 8C) -> (B, G, G, G, C).
    """
    b, g1, g2, g3, l = x.shape
    return x.reshape(b, g1, g2, g3, l // _SUBS, _SUBS).max(axis=-1)


def pool_refold(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool a phase-0 folded tensor and re-fold for the next level:
    (B, G, G, G, 8C) -> (B, G/2, G/2, G/2, 8C)."""
    return fold2(pool_consume_fold(x))


def upsample2x_folded(x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear 2x upsample producing FOLDED phase-0 output.

    x: (B, g1, g2, g3, C) unfolded. Output (B, g1, g2, g3, 8C) is the
    fold-2 of the 2x-upsampled (2g)^3 volume. Same closed form as
    ops.resize.upsample2x (half-pixel centers, clamped edges):
      out[2i] = 0.25 x[i-1] + 0.75 x[i]; out[2i+1] = 0.75 x[i] + 0.25 x[i+1]
    but the even/odd pair becomes a new sub axis instead of interleaving,
    so the result lands directly in folded lane order.
    """
    for ax in (1, 2, 3):
        n = x.shape[ax]
        first = jax.lax.slice_in_dim(x, 0, 1, axis=ax)
        last = jax.lax.slice_in_dim(x, n - 1, n, axis=ax)
        prev = jax.lax.slice_in_dim(jnp.concatenate([first, x], axis=ax), 0, n, axis=ax)
        nxt = jax.lax.slice_in_dim(jnp.concatenate([x, last], axis=ax), 1, n + 1, axis=ax)
        even = 0.25 * prev + 0.75 * x
        odd = 0.75 * x + 0.25 * nxt
        x = jnp.stack([even, odd], axis=-1)  # sub axis appended minor-side
        # merging as we go keeps every intermediate 5-D
        sh = x.shape
        x = x.reshape(sh[:4] + (-1,))
    # lanes are now (C, sd, sh, sw) c-major — exactly fold2's order
    return x


def fold2_phase1(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> PHASE-1 folded (B, D/2+1, H/2+1, W/2+1, 8C).

    Phase-1 block i holds positions (2i-1, 2i); the boundary positions
    -1 and D are genuine zero padding, so a phase-1 -> phase-0 (VALID)
    folded conv on this tensor computes exactly the SAME-padded 3^3 conv.
    This is the natural input fold for conv stacks with an ODD number of
    3^3 convs per block (VNet's enc0/dec3 — reference VNet.py:150,174):
    starting at phase-1 makes every block boundary land on phase-0,
    where strided 2^3 resamplers consume blocks directly."""
    pads = [(0, 0)] + [(1, 1)] * 3 + [(0, 0)]
    return fold2(jnp.pad(x, pads))


def unfold2_phase1(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fold2_phase1 (drops the zero/garbage boundary planes)."""
    y = unfold2(x)
    return y[:, 1:-1, 1:-1, 1:-1, :]


def strided_conv2_folded(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    compute_dtype=None,
    fold_output: bool = True,
) -> jnp.ndarray:
    """2^3 STRIDE-2 conv consuming a phase-0 folded tensor.

    Stride-2 windows coincide exactly with phase-0 blocks, so the conv
    collapses to ONE dense (8Ci, Co) matmul per block — no taps, no
    structural zeros (the folded analogue of VNet's DownsamplingConvBlock,
    reference VNet.py:45-63). x: (B, G, G, G, 8Ci); w: (2, 2, 2, Ci, Co)
    DHWIO. Returns the half-resolution output unfolded (B, G, G, G, Co)
    or, with fold_output, refolded phase-0 (B, G/2, G/2, G/2, 8Co)."""
    b_, g1, g2, g3, l = x.shape
    ci = l // _SUBS
    # lane k = c*8 + (qd*4 + qh*2 + qw)  ->  W[(c, q), co] = w[q, c, co]
    wm = w.transpose(3, 0, 1, 2, 4).reshape(ci * _SUBS, -1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wm = wm.astype(compute_dtype)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.einsum("bdhwl,ln->bdhwn", x, wm, preferred_element_type=preferred)
    if b is not None:
        y = y + b.astype(y.dtype)
    return fold2(y) if fold_output else y


def transposed_conv2_to_folded(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    *,
    compute_dtype=None,
) -> jnp.ndarray:
    """Transposed 2^3 stride-2 conv producing FOLDED phase-0 output.

    Each input voxel emits one complete 2x2x2 output block, i.e. exactly
    one phase-0 folded block: y[j, c*8+p] = sum_ci w[p, ci, c] x[j, ci]
    — one dense (Ci, 8Co) matmul, zero structural waste (the folded
    analogue of VNet's UpsamplingDeconvBlock, reference VNet.py:66-84;
    numerics = layers.conv_transpose3d(kernel 2, stride 2), fold2'd).
    x: (B, g, g, g, Ci) unfolded; returns (B, g, g, g, 8Co) folded."""
    ci = x.shape[-1]
    # output lane k = c*8 + p  ->  W[ci, (c, p)] = w[1-p, ci, c]: with
    # kernel==stride there is no tap overlap, and jax.lax.conv_transpose
    # (transpose_kernel=False, the layers.conv_transpose3d convention)
    # mirrors the kernel spatially, so output sub-position p takes the
    # spatially-flipped tap
    wm = w[::-1, ::-1, ::-1].transpose(3, 4, 0, 1, 2).reshape(ci, -1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wm = wm.astype(compute_dtype)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.einsum("bdhwc,cn->bdhwn", x, wm, preferred_element_type=preferred)
    if b is not None:
        y = y + fold_bias(b).astype(y.dtype)
    return y


def batch_norm_folded(
    params,
    state,
    x: jnp.ndarray,
    n_valid: int,
    masks: list[jnp.ndarray] | None = None,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm over a folded (B, G1, G2, G3, 8C) tensor.

    Matches models.layers.batch_norm numerics (f32 stats over
    (batch, space), biased normalize, unbiased running update, affine,
    same TWO-PASS variance — one-pass E[x^2]-E[x]^2 noise amplifies
    visibly through V-Net's nine stacked train-mode BNs); `n_valid` is
    the TRUE per-sample voxel count and `masks` the factored phase-1
    validity factors (phase1_lane_masks) — boundary planes stay out of
    the stats and are re-zeroed on output so the next folded conv sees
    zeros (centered boundary values are masked inside the variance
    pass). Returns (y, new_state)."""
    b, g1, g2, g3, l = x.shape
    c = l // _SUBS
    n = b * n_valid
    xf = x.astype(jnp.float32)
    if masks is not None:
        for m in masks:
            xf = xf * m
    if train:
        s1 = jnp.sum(xf, axis=(0, 1, 2, 3))              # (8C,)
        mean = s1.reshape(c, _SUBS).sum(-1) / n
        cent = xf - jnp.repeat(mean, _SUBS)[None, None, None, None, :]
        if masks is not None:
            for m in masks:
                cent = cent * m
        s2 = jnp.sum(jnp.square(cent), axis=(0, 1, 2, 3))
        var = s2.reshape(c, _SUBS).sum(-1) / n
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    scale = jax.lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    shift = params["bias"].astype(jnp.float32) - mean * scale
    scale_l = jnp.repeat(scale, _SUBS)[None, None, None, None, :]
    shift_l = jnp.repeat(shift, _SUBS)[None, None, None, None, :]
    y = x.astype(jnp.float32) * scale_l + shift_l
    if masks is not None:
        for m in masks:
            y = y * m
    return y.astype(x.dtype), new_state


def conv1x1_folded(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                   compute_dtype=None) -> jnp.ndarray:
    """1^3 conv (head) on a folded tensor: per-sub-position channel matmul.

    x: (B, G1, G2, G3, 8Ci); w: (1, 1, 1, Ci, Co). Output (..., 8Co).
    """
    b_, g1, g2, g3, l = x.shape
    ci = l // _SUBS
    wm = w.reshape(ci, -1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wm = wm.astype(compute_dtype)
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.einsum(
        "bdhwcs,cn->bdhwns",
        x.reshape(b_, g1, g2, g3, ci, _SUBS),
        wm,
        preferred_element_type=preferred,
    )
    y = y.reshape(b_, g1, g2, g3, -1)
    if b is not None:
        y = y + fold_bias(b).astype(y.dtype)
    return y
