"""Pallas TPU kernel for the fold-2 3^3 conv (ops/folding.folded_conv3).

Why: the XLA lowering of the folded conv (a 2^3-tap conv with 8C>=128
lanes) measures ~53% MXU at the network's shapes; its HBM traffic is
also doubled by materializing the (1,1)^3 pad of the phase-0 -> phase-1
direction. This kernel removes both overheads:

  * grid = one output d-plane per step: both contributing input
    d-planes live in VMEM and are reused by all 8 taps (x is read from
    HBM ~2x total, y written once, weights resident);
  * each tap is one (rows, 8Ci) @ (8Ci, 8Co) matmul on the MXU with
    f32 accumulation in VMEM scratch;
  * the phase-0 -> phase-1 pad is never materialized: edge taps write
    static sub-slices of the accumulator (zero-initialized), and the
    d-axis edge planes are skipped with pl.when.

Semantics are exactly `folding.folded_conv3(x, w, b, to_phase=...)`:
  to_phase=1: input phase-0 at grid G  -> output phase-1 at grid G+1
  to_phase=0: input phase-1 at grid G' -> output phase-0 at grid G'-1
Both directions use the same folded tap tensor (fold_conv3_weights).

Parity target (via ops/folding): the reference 3^3 conv stacks,
/root/reference/code/networks/utils.py:99-124.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folding import fold_bias, fold_conv3_weights


def _kernel(x0_ref, x1_ref, w_ref, o_ref, acc_ref, *, to_phase: int,
            gd_in: int, qd_out: int, out_dtype):
    """One output d-plane.

    x0_ref/x1_ref: (1, GH, GW, L) input planes at d_in = qd-1+t (phase-1
    out) or qd+t (phase-0 out); the index map clamps out-of-range plane
    indices, and the corresponding taps are skipped with pl.when.
    w_ref: (2, 2, 2, L, L) folded taps. o_ref: (1, QH, QW, L).
    acc_ref: (QH, QW, L) f32 scratch.
    """
    qd = pl.program_id(0) % qd_out  # output plane index within the batch item
    acc_ref[...] = jnp.zeros_like(acc_ref)

    gh = x0_ref.shape[1]
    gw = x0_ref.shape[2]
    qh = o_ref.shape[1]
    qw = o_ref.shape[2]
    # per-axis static slice bounds for tap t: output rows o = i - t + 1
    # (to_phase=1) or o = i - t (to_phase=0), i in [0, G)
    if to_phase == 1:
        def bounds(t, g, q):  # -> (i_lo, o_lo, n)
            i_lo = max(t - 1, 0)
            o_lo = max(1 - t, 0)
            n = min(g - i_lo, q - o_lo)
            return i_lo, o_lo, n
    else:
        def bounds(t, g, q):
            i_lo = t
            o_lo = 0
            n = min(g - t, q)
            return i_lo, o_lo, n

    for td in range(2):
        x_ref = (x0_ref, x1_ref)[td]
        if to_phase == 1:
            # input plane d_in = qd - 1 + td; qd ranges [0, gd_in]:
            # td=0 invalid at qd=0, td=1 invalid at qd=gd_in
            cond = (qd >= 1) if td == 0 else (qd < gd_in)
        else:
            cond = None  # d_in = qd + td always in range (q = g - 1)
        contribs = []
        for th in range(2):
            ih_lo, oh_lo, nh = bounds(th, gh, qh)
            for tw in range(2):
                iw_lo, ow_lo, nw = bounds(tw, gw, qw)
                contribs.append((th, tw, ih_lo, oh_lo, nh, iw_lo, ow_lo, nw))

        def add_taps():
            for th, tw, ih_lo, oh_lo, nh, iw_lo, ow_lo, nw in contribs:
                win = x_ref[0, ih_lo:ih_lo + nh, iw_lo:iw_lo + nw, :]
                k = w_ref[td, th, tw]
                y = jax.lax.dot_general(
                    win, k,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_ref[oh_lo:oh_lo + nh, ow_lo:ow_lo + nw, :] += y

        if cond is None:
            add_taps()
        else:
            @pl.when(cond)
            def _():
                add_taps()

    o_ref[0] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("to_phase", "interpret"))
def folded_conv3_pallas(
    x: jnp.ndarray,
    wf: jnp.ndarray,
    *,
    to_phase: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, G1, G2, G3, L) folded; wf: (2, 2, 2, L, L) folded taps
    (fold_conv3_weights(w), cast to x.dtype by the caller). Returns the
    folded conv output (B, Q1, Q2, Q3, L) in x.dtype; f32 accumulate.
    """
    b, g1, g2, g3, l = x.shape
    if to_phase == 1:
        q1, q2, q3 = g1 + 1, g2 + 1, g3 + 1
    else:
        q1, q2, q3 = g1 - 1, g2 - 1, g3 - 1

    x2 = x.reshape(b * g1, g2, g3, l)

    if to_phase == 1:
        # output plane qd needs input planes qd-1, qd (clamped)
        def im0(i):
            bb, qd = i // q1, i % q1
            return (bb * g1 + jnp.maximum(qd - 1, 0), 0, 0, 0)

        def im1(i):
            bb, qd = i // q1, i % q1
            return (bb * g1 + jnp.minimum(qd, g1 - 1), 0, 0, 0)
    else:
        def im0(i):
            bb, qd = i // q1, i % q1
            return (bb * g1 + qd, 0, 0, 0)

        def im1(i):
            bb, qd = i // q1, i % q1
            return (bb * g1 + qd + 1, 0, 0, 0)

    kernel = functools.partial(
        _kernel, to_phase=to_phase, gd_in=g1, qd_out=q1, out_dtype=x.dtype
    )
    y = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b * q1,),
        in_specs=[
            pl.BlockSpec((1, g2, g3, l), im0),
            pl.BlockSpec((1, g2, g3, l), im1),
            pl.BlockSpec((2, 2, 2, l, l), lambda i: (0, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q2, q3, l), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * q1, q2, q3, l), x.dtype),
        scratch_shapes=[pltpu.VMEM((q2, q3, l), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * q1 * q2 * q3 * l * l * 8,
            bytes_accessed=(2 * b * q1 * g2 * g3 * l + b * q1 * q2 * q3 * l)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, x2, wf)
    return y.reshape(b, q1, q2, q3, l)


def _slabs(a: jnp.ndarray, t: tuple[int, int, int], n: tuple[int, int, int],
           base: tuple[int, int, int]) -> jnp.ndarray:
    """Static slab a[:, base0+t0 : base0+t0+n0, ...] over the 3 spatial axes."""
    s = [slice(None)]
    for ax in range(3):
        lo = base[ax] + t[ax]
        s.append(slice(lo, lo + n[ax]))
    return a[tuple(s) + (slice(None),)]


def _dwf(x: jnp.ndarray, dy: jnp.ndarray, to_phase: int) -> jnp.ndarray:
    """d loss / d folded-taps: dwf[t] = sum_q x[q+ofs+t] (x) dy[q]."""
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    g = x.shape[1:4]
    q = dy.shape[1:4]
    out = []
    for td in range(2):
        for th in range(2):
            for tw in range(2):
                t = (td, th, tw)
                if to_phase == 1:
                    # valid q range per axis: [max(1-t,0), ...) with
                    # x index q-1+t; slab length n = g (t=1) or g (t=0)
                    n = tuple(min(g[a] - max(t[a] - 1, 0), q[a] - max(1 - t[a], 0))
                              for a in range(3))
                    xs = _slabs(xf, tuple(max(t[a] - 1, 0) for a in range(3)), n, (0, 0, 0))
                    ds = _slabs(dyf, tuple(max(1 - t[a], 0) for a in range(3)), n, (0, 0, 0))
                else:
                    n = q
                    xs = _slabs(xf, t, n, (0, 0, 0))
                    ds = _slabs(dyf, (0, 0, 0), n, (0, 0, 0))
                out.append(jnp.einsum("bdhwa,bdhwn->an", xs, ds))
    l = x.shape[-1]
    return jnp.stack(out).reshape(2, 2, 2, l, l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_wf(x, wf, to_phase: int, interpret: bool):
    return folded_conv3_pallas(x, wf, to_phase=to_phase, interpret=interpret)


def _conv_wf_fwd(x, wf, to_phase, interpret):
    return _conv_wf(x, wf, to_phase, interpret), (x, wf)


def _conv_wf_bwd(to_phase, interpret, res, dy):
    """Backward of a folded conv is a folded conv in the opposite phase
    direction with taps flipped+transposed; dwf is 8 reduction matmuls
    (XLA — MXU-shaped, contraction = the whole grid)."""
    x, wf = res
    wf_t = jnp.flip(wf, (0, 1, 2)).swapaxes(3, 4)
    dx = _conv_wf(dy, wf_t, 1 - to_phase, interpret).astype(x.dtype)
    dwf = _dwf(x, dy, to_phase).astype(wf.dtype)
    return dx, dwf


_conv_wf.defvjp(_conv_wf_fwd, _conv_wf_bwd)


def folded_conv3_via_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None,
    *,
    to_phase: int,
    compute_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for folding.folded_conv3 backed by the Pallas kernel,
    differentiable (custom VJP: dx via the opposite-direction kernel,
    dw via XLA reduction matmuls, then autodiff through the linear
    fold_conv3_weights gather)."""
    wf = fold_conv3_weights(w)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wf = wf.astype(compute_dtype)
    else:
        wf = wf.astype(x.dtype)
    y = _conv_wf(x, wf, to_phase, interpret)
    if bias is not None:
        y = y + fold_bias(bias).astype(y.dtype)
    return y
