"""Training-step throughput benchmark for the three canonical configs.

Measures the full jitted DyCON step (student+teacher forward, four
losses, grad, clip, SGD, EMA, NaN guard) on synthetic batches — no
dataset needed. Prints one JSON line per config.

Usage: python scripts/bench_train.py [--configs pancreas isles22]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable from anywhere: the package lives next to scripts/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFIGS = {
    # (batch, labeled_bs, patch, extra config overrides)
    "pancreas": dict(batch_size=8, labeled_bs=4, patch_size=(112, 112, 96)),
    "brats19": dict(batch_size=8, labeled_bs=4, patch_size=(96, 96, 96)),
    "isles22": dict(batch_size=2, labeled_bs=1, patch_size=(96, 96, 64)),
}


def bench_one(dataset: str, iters: int = 5, **overrides) -> dict:
    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.config import make_config
    from dycon_paper_replication_tpu.models import net_factory_3d
    from dycon_paper_replication_tpu.train.state import create_train_state, make_optimizer
    from dycon_paper_replication_tpu.train.step import (
        StepScalars,
        build_train_step,
        unpack_scalars,
    )

    cfg = make_config(dataset, **{**dict(compute_dtype="bfloat16"),
                                  **CONFIGS[dataset], **overrides})
    model = net_factory_3d(
        cfg.model, in_chns=cfg.in_ch, class_num=cfg.num_classes,
        scaler=cfg.feature_scaler, compute_dtype=jnp.bfloat16, layout=cfg.resolved_layout(),
    )
    opt = make_optimizer(lambda s: cfg.base_lr)
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(build_train_step(model, opt, cfg), donate_argnums=(0,))

    bs, ps = cfg.batch_size, cfg.patch_size
    rng = np.random.default_rng(0)
    label = rng.integers(0, 2, size=(bs, *ps)).astype(np.int32)
    batch = {
        "image": jnp.asarray(label[..., None] + rng.normal(size=(bs, *ps, 1)), jnp.float32),
        "label": jnp.asarray(label),
    }
    sc = StepScalars.make(5.0, 0.01, 1.3, 0.3)

    state, m = step(state, batch, jax.random.key(1), sc)
    unpack_scalars(m)  # sync
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(2 + i), sc)
    v = unpack_scalars(m)
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": f"{dataset}_train_step",
        "model": cfg.model,
        "value": round(dt * 1000, 1),
        "unit": "ms/step",
        "batch_size": bs,
        "patch": list(ps),
        "layout": cfg.resolved_layout(),
        "loss": round(v["loss"], 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=list(CONFIGS))
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--layout", type=str, default=None,
                   choices=["NDHWC", "NCDHW", "folded"])
    p.add_argument("--fecl_impl", type=str, default=None,
                   choices=["fused", "chunked"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--remat", type=str, default=None, choices=["none", "full"])
    p.add_argument("--model", type=str, default=None, choices=["unet_3D", "vnet"])
    args = p.parse_args(argv)
    overrides = {k: v for k, v in
                 [("layout", args.layout), ("fecl_impl", args.fecl_impl),
                  ("batch_size", args.batch_size), ("remat", args.remat),
                  ("model", args.model)] if v is not None}
    for name in args.configs:
        print(json.dumps(bench_one(name, args.iters, **overrides)), flush=True)


if __name__ == "__main__":
    main()
