"""Drive --model vnet end-to-end (train -> checkpoint -> dense eval) on
synthetic Pancreas canonical geometry (VERDICT r2 #5: "VNet is a
correctness artifact, not a peer").

Generates the same canonical synthetic tree the round-2 quality tables
used (62 train / 20 test ellipsoid volumes at (128,128,112)), trains
VNet at the exact reference Pancreas config (labelnum 12, batch 8 with
4 labeled, patch (112,112,96) — run_Panc.sh) for --iters iterations
(the synthetic task saturates by ~1000), then runs the reference dense
eval protocol (patch 96^3, stride 16/4, test_Pancreas.py:54,67-70).

Prints one JSON line with best val dice + the test-set metric table.
Usage: python scripts/exp_vnet_e2e.py [--iters 1000] [--batch_size 8]
       [--layout auto]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--layout", type=str, default="auto")
    p.add_argument("--root", type=str, default="/tmp/canon_pancreas")
    p.add_argument("--work", type=str, default="/tmp/vnet_e2e")
    args = p.parse_args()

    from dycon_paper_replication_tpu.data.synthetic import make_pancreas

    if not os.path.exists(os.path.join(args.root, "train.list")):
        print("generating canonical synthetic dataset ...", flush=True)
        make_pancreas(args.root, n_train=62, n_test=20, shape=(128, 128, 112), seed=1)

    from dycon_paper_replication_tpu.config import make_config
    from dycon_paper_replication_tpu.train.trainer import Trainer

    cfg = make_config(
        "pancreas",
        root_dir=args.root,
        snapshot_root=args.work,
        exp="canon_vnet",
        model="vnet",
        batch_size=args.batch_size,
        labeled_bs=args.batch_size // 2,
        max_iterations=args.iters,
        val_every=max(args.iters // 5, 100),
        save_every=args.iters,
        compute_dtype="bfloat16",
        layout=args.layout,
    )
    print(f"=== vnet train {args.iters} iters (layout={cfg.resolved_layout()}) ===",
          flush=True)
    best = Trainer(cfg).run()
    print(json.dumps({"phase": "train", "best_val_dice": float(best)}), flush=True)

    from dycon_paper_replication_tpu.cli import test_pancreas

    dice, jaccard, hd95, asd = test_pancreas.main([
        "--root_path", args.root,
        "--snapshot_root", args.work,
        "--exp", "canon_vnet",
        "--model", "vnet",
        "--max_iterations", str(args.iters),
        "--list_name", "test1.list",
    ])
    print("FINAL", json.dumps(dict(
        best_val_dice=float(best), test_dice=float(dice),
        test_jaccard=float(jaccard), test_hd95=float(hd95),
        test_asd=float(asd))), flush=True)


if __name__ == "__main__":
    main()
