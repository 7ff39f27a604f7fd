"""Experiment: where does the folded conv's missing MXU go?

Compares, at exactly the folded conv's shapes (B=8, G=48, 128 lanes):
  gemm1024 — one (M, 1024) @ (1024, 128) GEMM: the conv's FLOPs as a
             single dense matmul (im2col best case, no conv semantics)
  gemm8x   — 8 accumulated (M, 128) @ (128, 128) GEMMs: the conv's
             per-tap structure without shifts
  conv     — the actual folded_conv3 pair (baseline 2.2 ms/conv)

All bf16 with f32 accumulate where applicable, timed amortized inside
one jit (relay-safe protocol from scripts/bench_folded.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

import jax
import jax.numpy as jnp


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
M = B * G * G * G
rng = np.random.default_rng(0)


def _dev_normal(key, shape, dtype=jnp.bfloat16):
    """Generate operands ON DEVICE — the relay H2D link is tens of MB/s,
    so host-numpy operands of this size would take tens of minutes."""
    return jax.jit(lambda: jax.random.normal(jax.random.key(key), shape, dtype))()


def bench_gemm1024(K):
    x = _dev_normal(0, (M, 1024))
    w = _dev_normal(1, (1024, 128))

    def builder(k):
        @jax.jit
        def f():
            # scalar carry perturbs w so the matmul cannot be hoisted
            def body(_, carry):
                w2 = w * (1 + 1e-20 * carry).astype(jnp.bfloat16)
                y = jnp.dot(x, w2, preferred_element_type=jnp.bfloat16)
                return y[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return f

    ms = timed(builder, K) * 1e3
    fl = 2 * M * 1024 * 128
    return {"metric": "gemm_M_1024_128", "ms": round(ms, 3),
            "tflops": round(fl / ms / 1e9, 1)}


def bench_gemm8x(K):
    x = _dev_normal(2, (M, 128))
    ws = [_dev_normal(3 + i, (128, 128)) for i in range(8)]

    def builder(k):
        @jax.jit
        def f():
            def body(_, carry):
                scale = (1 + 1e-20 * carry).astype(jnp.bfloat16)
                acc = jnp.zeros((M, 128), jnp.float32)
                for w in ws:
                    acc = acc + jnp.dot(x, w * scale, preferred_element_type=jnp.float32)
                return acc[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return f

    ms = timed(builder, K) * 1e3
    fl = 2 * M * 128 * 128 * 8
    return {"metric": "gemm_8tap_sum", "ms": round(ms, 3),
            "tflops": round(fl / ms / 1e9, 1)}


def bench_conv(K):
    from dycon_paper_replication_tpu.ops import folding

    x = _dev_normal(20, (B, G, G, G, 8 * C))
    w1 = _dev_normal(21, (3, 3, 3, C, C), jnp.float32) * 0.05
    w2 = _dev_normal(22, (3, 3, 3, C, C), jnp.float32) * 0.05

    def builder(k):
        @jax.jit
        def f():
            def body(_, h):
                y = folding.folded_conv3(h, w1, None, to_phase=1, compute_dtype=jnp.bfloat16)
                return folding.folded_conv3(y, w2, None, to_phase=0, compute_dtype=jnp.bfloat16)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0, 0, 0, 0].astype(jnp.float32))
        return f

    ms = timed(builder, K) * 1e3 / 2
    fl = 2 * M * 1024 * 128  # per conv, dense-folded count
    return {"metric": "folded_conv3 (per conv)", "ms": round(ms, 3),
            "tflops": round(fl / ms / 1e9, 1)}


if __name__ == "__main__":
    # Run ONE benchmark per invocation (argv[1] in gemm1024|gemm8x|conv):
    # each new program is a remote compile through the relay; a wedged
    # compile hangs the whole process AND subsequent relay requests, so
    # isolate benchmarks in separate processes.
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    table = {"gemm1024": bench_gemm1024, "gemm8x": bench_gemm8x, "conv": bench_conv}
    names = sys.argv[1:] or list(table)
    for name in names:
        print(f"# start {name}", file=sys.stderr, flush=True)
        print(json.dumps(table[name](8)), flush=True)
