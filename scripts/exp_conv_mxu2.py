"""Experiment 2: candidate folded-conv formulations, measured on device.

exp_conv_mxu.py separates compute ceiling (gemm) from the current
`conv_general_dilated` lowering. This script times drop-in candidates at
the same shapes (B=8, G=48, 128 lanes, bf16):

  conv_xla    — current folded_conv3 (conv_general_dilated, 2^3 taps)
  conv_shift  — 8 static slices of the padded tensor, each einsum'd with
                its (128, 128) tap matrix and accumulated (the gemm8x
                pattern with real shifted operands)
  conv_dot27  — per-o valid-tap contraction: one (M, 27*Ci) gather per
                output sub-position, dense (27Ci, Ci) matmuls — minimal
                FLOPs (216 C^2 vs 512 C^2) but 8 narrow-N matmuls

Each candidate is verified against folded_conv3 on small shapes first.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp

from dycon_paper_replication_tpu.ops import folding


def conv_shift(x, w, *, to_phase, compute_dtype=jnp.bfloat16):
    """folded_conv3 as 8 shifted (M,8Ci)@(8Ci,8Co) accumulated matmuls."""
    wf = folding.fold_conv3_weights(w).astype(compute_dtype)
    x = x.astype(compute_dtype)
    if to_phase == 1:
        x = jnp.pad(x, [(0, 0)] + [(1, 1)] * 3 + [(0, 0)])
    g = [s - 1 for s in x.shape[1:4]]
    acc = None
    for td in range(2):
        for th in range(2):
            for tw in range(2):
                xs = x[:, td:td + g[0], th:th + g[1], tw:tw + g[2], :]
                y = jnp.einsum(
                    "bdhwl,ln->bdhwn", xs, wf[td, th, tw],
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
    return acc.astype(compute_dtype)


def timed(builder, K=8, repeats=4):
    def run(k):
        f = builder(k)
        t0 = time.perf_counter()
        float(f())  # compile + first run
        print(f"#   compiled K={k} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tK = run(K)
    return max(tK - t1, 0.0) / (K - 1)


B, G, C = 8, 48, 16


def verify():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 8 * C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1, jnp.float32)
    for to_phase in (0, 1):
        ref = folding.folded_conv3(x, w, None, to_phase=to_phase)
        got = conv_shift(x, w, to_phase=to_phase, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    print("# verify ok", file=sys.stderr)


def _dev_normal(key, shape, dtype=jnp.bfloat16):
    """On-device operands — the relay H2D link is tens of MB/s."""
    return jax.jit(lambda: jax.random.normal(jax.random.key(key), shape, dtype))()


def bench(name, conv_fn, K=8):
    x = _dev_normal(20, (B, G, G, G, 8 * C))
    w1 = _dev_normal(21, (3, 3, 3, C, C), jnp.float32) * 0.05
    w2 = _dev_normal(22, (3, 3, 3, C, C), jnp.float32) * 0.05

    def builder(k):
        @jax.jit
        def f():
            def body(_, h):
                y = conv_fn(h, w1, to_phase=1)
                return conv_fn(y, w2, to_phase=0)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0, 0, 0, 0].astype(jnp.float32))
        return f

    ms = timed(builder, K) * 1e3 / 2
    M = B * G * G * G
    fl = 2 * M * 1024 * 128
    print(json.dumps({"metric": name, "ms": round(ms, 3),
                      "dense_tflops": round(fl / ms / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    # One benchmark per invocation (argv in conv_xla|conv_shift) — see
    # exp_conv_mxu.py on relay-compile isolation. verify runs on CPU.
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    def conv_pallas(h, w, to_phase):
        from dycon_paper_replication_tpu.ops.folded_conv_pallas import (
            folded_conv3_via_pallas,
        )

        return folded_conv3_via_pallas(
            h, w, None, to_phase=to_phase, compute_dtype=jnp.bfloat16
        )

    table = {
        "verify": verify,
        "conv_xla": lambda: bench("conv_xla", lambda h, w, to_phase: folding.folded_conv3(
            h, w, None, to_phase=to_phase, compute_dtype=jnp.bfloat16)),
        "conv_shift": lambda: bench("conv_shift", conv_shift),
        "conv_pallas": lambda: bench("conv_pallas", conv_pallas),
    }
    for name in (sys.argv[1:] or list(table)):
        print(f"# start {name}", file=sys.stderr, flush=True)
        table[name]()
