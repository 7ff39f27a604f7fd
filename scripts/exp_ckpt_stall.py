"""Measure the checkpoint-save stall on the training critical path.

VERDICT r2 #6: the round-2 checkpointer claimed async but blocked the
step on orbax's device->host fetch. This measures, on the real device:

  snapshot_ms — the on-device TrainState copy (Trainer._copy_state)
  submit_ms   — save_checkpoint() return latency (the stall a training
                step now pays at save_every)
  blocking_ms — the same save with block=True (what round 2 paid)

Usage: python scripts/exp_ckpt_stall.py [--patch 112 112 96]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--patch", type=int, nargs=3, default=(112, 112, 96))
    p.add_argument("--out", type=str, default="/tmp/ckpt_stall")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.config import make_config
    from dycon_paper_replication_tpu.models import net_factory_3d
    from dycon_paper_replication_tpu.train.state import create_train_state, make_optimizer
    from dycon_paper_replication_tpu.utils import checkpoint

    cfg = make_config("pancreas", patch_size=tuple(args.patch))
    model = net_factory_3d(cfg.model, in_chns=1, class_num=2,
                           scaler=cfg.feature_scaler)
    state = create_train_state(model, jax.random.key(0), make_optimizer(lambda s: 0.01))
    n_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                  for x in jax.tree.leaves(state) if hasattr(x, "shape"))

    copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    snap = copy_state(state)
    jax.block_until_ready(jax.tree.leaves(snap)[0])
    t0 = time.perf_counter()
    snap = copy_state(state)
    float(jnp.sum(jax.tree.leaves(snap.params)[0]))  # forced sync through relay
    snapshot_ms = (time.perf_counter() - t0) * 1e3

    shutil.rmtree(args.out, ignore_errors=True)
    t0 = time.perf_counter()
    checkpoint.save_checkpoint(os.path.join(args.out, "async"), snap)
    submit_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    checkpoint.wait_until_finished()
    drain_ms = (time.perf_counter() - t0) * 1e3

    snap2 = copy_state(state)
    t0 = time.perf_counter()
    checkpoint.save_checkpoint(os.path.join(args.out, "blocking"), snap2, block=True)
    blocking_ms = (time.perf_counter() - t0) * 1e3

    print(json.dumps({
        "metric": "checkpoint_stall",
        "state_mb": round(n_bytes / 1e6, 1),
        "snapshot_ms": round(snapshot_ms, 1),
        "submit_ms": round(submit_ms, 1),
        "drain_ms": round(drain_ms, 1),
        "blocking_ms": round(blocking_ms, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
