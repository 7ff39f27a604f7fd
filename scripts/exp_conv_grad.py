"""Experiment: does the folded conv's BACKWARD pay a layout tax?

The remat=none Pancreas step measures backward+tail ~= 2.35x one forward
(BASELINE.md); theoretical backward is 2x (dX + dW, residuals stored).
This isolates the conv itself: an unrolled chain of K folded conv pairs
(the production shape B=8, G=48, 128 lanes, bf16) timed

  fwd   — forward only
  grad  — value_and_grad wrt (x, weights): forward + dX chain + dW

backward-only = grad - fwd; ratio (grad - fwd) / fwd ~= 2.0 means XLA's
conv_general_dilated autodiff (flipped-kernel dX conv + batch-swapped dW
conv) runs the folded taps as efficiently as the forward, and the
roadmap's "conv-transpose grad layouts" lever is already at its floor.
Ratios well above ~2.4 would justify a custom VJP that expresses dX as
folded_conv3 (phase-swapped, spatially flipped taps) and dW as one
dot_general.

Relay protocol: operands generated on device, timing amortized over the
chain depth inside one jit, one experiment per process (argv picks the
case) — see scripts/exp_conv_mxu.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

from dycon_paper_replication_tpu.ops import folding

B, G, C = 8, 48, 16
PAIRS = 4  # chain depth: 8 convs total; residuals ~226 MB bf16 each


def _dev_normal(key, shape, dtype=jnp.bfloat16):
    return jax.jit(lambda: jax.random.normal(jax.random.key(key), shape, dtype))()


def _chain(x, ws):
    """PAIRS folded conv pairs (phase 0 -> 1 -> 0), bf16, no norms."""
    h = x
    for w1, w2 in ws:
        h = folding.folded_conv3(h, w1, None, to_phase=1, compute_dtype=jnp.bfloat16)
        h = folding.folded_conv3(h, w2, None, to_phase=0, compute_dtype=jnp.bfloat16)
    return jnp.sum(h.astype(jnp.float32))


def _time(f, repeats=5):
    t0 = time.perf_counter()
    float(f())
    print(f"#   compiled in {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    x = _dev_normal(0, (B, G, G, G, 8 * C))
    ws = [
        (
            _dev_normal(10 + 2 * i, (3, 3, 3, C, C), jnp.float32) * 0.05,
            _dev_normal(11 + 2 * i, (3, 3, 3, C, C), jnp.float32) * 0.05,
        )
        for i in range(PAIRS)
    ]

    fwd = jax.jit(lambda x, ws: _chain(x, ws))

    def loss_grad(x, ws):
        val, grads = jax.value_and_grad(_chain, argnums=(0, 1))(x, ws)
        # fold every grad into one scalar so the D2H is a single float
        leaves = jax.tree_util.tree_leaves(grads)
        return val + sum(jnp.sum(g.astype(jnp.float32)) for g in leaves)

    grad = jax.jit(loss_grad)

    which = sys.argv[1:] or ["fwd", "grad"]
    out = {}
    if "fwd" in which:
        t = _time(lambda: fwd(x, ws))
        out["fwd_ms_per_conv"] = round(t * 1e3 / (2 * PAIRS), 3)
        print(json.dumps({"metric": "chain_fwd", "ms_total": round(t * 1e3, 2),
                          "ms_per_conv": out["fwd_ms_per_conv"]}), flush=True)
    if "grad" in which:
        t = _time(lambda: grad(x, ws))
        out["grad_ms_per_conv"] = round(t * 1e3 / (2 * PAIRS), 3)
        print(json.dumps({"metric": "chain_grad", "ms_total": round(t * 1e3, 2),
                          "ms_per_conv": out["grad_ms_per_conv"]}), flush=True)
    if "fwd_ms_per_conv" in out and "grad_ms_per_conv" in out:
        bwd = out["grad_ms_per_conv"] - out["fwd_ms_per_conv"]
        print(json.dumps({
            "metric": "conv_backward_overhead",
            "bwd_ms_per_conv": round(bwd, 3),
            "bwd_over_fwd": round(bwd / out["fwd_ms_per_conv"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
