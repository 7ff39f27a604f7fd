"""Microbenchmarks for the fold-2 conv engine (ops/folding.py).

Measures, on the current default device:
  * xla3   — plain XLA 3^3 conv f0->f0 at full resolution (round-1
             measurement: 9.9 ms for 16->16 @ (8, 96^3) bf16 on v5e)
  * foldpair — one phase-0->1 + one phase-1->0 folded conv pair
             (the folded equivalent of TWO 3^3 convs)
  * block  — a full folded UnetConv3 block vs the unfolded NDHWC block
  * fwd    — full UNet3D forward, folded vs NCDHW layouts

Timing through the axon relay cannot rely on block_until_ready (see
CLAUDE.md): every measurement amortizes K iterations inside ONE jitted
lax.fori_loop and reports (t[K] - t[1]) / (K - 1), syncing via a scalar
D2H fetch.

Usage: python scripts/bench_folded.py [--what xla3 foldpair block fwd] [-K 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def timed(fn_builder, K: int, repeats: int = 4):
    """fn_builder(k) -> jitted zero-arg callable returning a scalar.

    Relay D2H latency has multi-second positive spikes, so a single
    t(K)-t(1) sample can be garbage (even negative). Noise is additive
    and positive: take the MIN over `repeats` samples of each of t(1)
    and t(K) before differencing."""

    def run(k):
        f = fn_builder(k)
        f()  # compile + first dispatch
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f())  # scalar D2H forces completion through the relay
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tK = run(K)
    return max(tK - t1, 0.0) / (K - 1)


def bench_xla3(K):
    import jax
    import jax.numpy as jnp

    B, S, C = 8, 96, 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, S, S, S, C)), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, 3, C, C)) * 0.05,
                    jnp.bfloat16)

    def builder(k):
        @jax.jit
        def f():
            def body(_, h):
                return jax.lax.conv_general_dilated(
                    h, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0, 0, 0, 0].astype(jnp.float32))
        return f

    return {"metric": "xla_conv3_16x16_96", "ms": timed(builder, K) * 1e3 / 1, "per": "conv"}


def bench_foldpair(K):
    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.ops import folding

    B, G, C = 8, 48, 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, G, G, G, 8 * C)),
                    jnp.bfloat16)
    w1 = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, 3, C, C)) * 0.05,
                     jnp.float32)
    w2 = jnp.asarray(np.random.default_rng(2).standard_normal((3, 3, 3, C, C)) * 0.05,
                     jnp.float32)

    def builder(k):
        @jax.jit
        def f():
            def body(_, h):
                y = folding.folded_conv3(h, w1, None, to_phase=1, compute_dtype=jnp.bfloat16)
                return folding.folded_conv3(y, w2, None, to_phase=0, compute_dtype=jnp.bfloat16)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0, 0, 0, 0].astype(jnp.float32))
        return f

    return {"metric": "folded_conv3_pair_16x16_96", "ms": timed(builder, K) * 1e3 / 2,
            "per": "conv"}


def bench_block(K):
    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.models.unet3d_folded import _folded_block
    from dycon_paper_replication_tpu.models import layers as L

    B, G, C = 8, 48, 16
    key = jax.random.key(0)
    p = {
        "conv1": L.conv3d_init(jax.random.key(1), C, C),
        "conv2": L.conv3d_init(jax.random.key(2), C, C),
    }
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, G, G, G, 8 * C)),
                    jnp.bfloat16)

    def builder(k):
        @jax.jit
        def f():
            def body(_, h):
                return _folded_block(p, h, grid=(G, G, G), n_valid=(2 * G) ** 3,
                                     cd=jnp.bfloat16).astype(jnp.bfloat16)
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0, 0, 0, 0].astype(jnp.float32))
        return f

    return {"metric": "folded_block_16_96", "ms": timed(builder, K) * 1e3, "per": "block(2conv)"}


def bench_fwd(K, layout):
    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.models import net_factory_3d

    model = net_factory_3d("unet_3D", scaler=2, compute_dtype=jnp.bfloat16, layout=layout)
    params, state = model.init(jax.random.key(0))
    B, S = 8, 96
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, S, S, S, 1)), jnp.float32)

    def builder(k):
        @jax.jit
        def f():
            def body(_, h):
                (_, seg, _), _ = model.apply(params, state, h, train=False,
                                             with_projection=False)
                return h + 1e-6 * seg[..., :1]
            y = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(y[0, 0, 0, 0])
        return f

    ms = timed(builder, K) * 1e3
    return {"metric": f"unet3d_fwd_{layout}_b8_96", "ms": ms,
            "ms_per_patch": ms / B, "per": "batch8 fwd"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", nargs="*", default=["xla3", "foldpair"])
    ap.add_argument("-K", type=int, default=8)
    args = ap.parse_args(argv)
    import jax

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    for w in args.what:
        if w == "xla3":
            r = bench_xla3(args.K)
        elif w == "foldpair":
            r = bench_foldpair(args.K)
        elif w == "block":
            r = bench_block(args.K)
        elif w == "fwd":
            r = bench_fwd(args.K, "folded")
        elif w in ("fwd_ncdhw", "fwd_ndhwc"):
            r = bench_fwd(args.K, w.split("_")[1].upper())
        else:
            raise SystemExit(f"unknown bench {w}")
        r["ms"] = round(r["ms"], 3)
        if "ms_per_patch" in r:
            r["ms_per_patch"] = round(r["ms_per_patch"], 3)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
