"""End-to-end trainer WALL time per iteration, A/B over the host-loop
levers (VERDICT r3 #7): the device step is 416 ms (bf16 folded
remat=none, BASELINE.md) but the observed canonical wall is ~1.3 s/iter
— the gap is host-side (blocking per-iteration D2H metric fetch through
the high-latency relay link, diagnostic output materialization). This
measures the REAL Trainer.run() on synthetic canonical-geometry data:

  sync      — fetch_ahead=0, step_diagnostics=always   (round-3 loop)
  pipelined — fetch_ahead=1, step_diagnostics=cadence  (flag-gated)

Usage: python scripts/exp_trainer_wall.py --mode {sync,pipelined}
           [--iters 200] [--dataset pancreas]

One JSON line: {"mode":..., "iters":N, "wall_s_per_iter":..., ...}.
The first 30 iterations (compile + cache warm) are excluded via a
mid-run timestamp. One mode per process (relay protocol, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["sync", "pipelined"], required=True)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dataset", default="pancreas")
    ap.add_argument("--warmup", type=int, default=30)
    args = ap.parse_args()

    from dycon_paper_replication_tpu.config import make_config
    from dycon_paper_replication_tpu.data import synthetic
    from dycon_paper_replication_tpu.train import trainer as trainer_mod
    from dycon_paper_replication_tpu.train.trainer import Trainer

    flags = (
        dict(fetch_ahead=0, step_diagnostics="always")
        if args.mode == "sync"
        else dict(fetch_ahead=1, step_diagnostics="cadence")
    )

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "Pancreas")
        print("generating synthetic canonical tree...", file=sys.stderr, flush=True)
        synthetic.make_pancreas(root, n_train=16, n_test=2, shape=(128, 128, 112))
        cfg = make_config(
            args.dataset,
            root_dir=root,
            snapshot_root=os.path.join(tmp, "runs"),
            max_iterations=args.iters,
            # keep val/save out of the measured window; HD95+monitor
            # cadence still fires as in the canonical run
            val_every=10 ** 6,
            save_every=10 ** 6,
            compute_dtype="bfloat16",
            **flags,
        )
        # hd95 cadence = val_every//4 would never fire with val pushed
        # out; pin it to the canonical 50 so both modes pay it honestly
        t = Trainer(cfg)
        t.hd95_every = 50
        marks = {}
        orig = Trainer._finish_step

        def timed(self, m, scalars, batch, iter_num):
            out = orig(self, m, scalars, batch, iter_num)
            if out == args.warmup or (out == args.iters and args.iters > args.warmup):
                marks[out] = time.perf_counter()
            return out

        trainer_mod.Trainer._finish_step = timed
        try:
            t.run()
        finally:
            trainer_mod.Trainer._finish_step = orig
        dt = marks[args.iters] - marks[args.warmup]
        n = args.iters - args.warmup
        print(json.dumps({
            "mode": args.mode,
            "dataset": args.dataset,
            "iters_measured": n,
            "wall_s_per_iter": round(dt / n, 4),
            "iters_per_sec": round(n / dt, 4),
            **{f"timer_{k}": round(v, 2) for k, v in t.timer.stats().items()},
        }))


if __name__ == "__main__":
    main()
