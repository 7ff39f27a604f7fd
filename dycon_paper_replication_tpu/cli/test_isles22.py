"""Offline ISLES-2022 evaluation (reference test_ISLES22.py): whole-
volume single-forward prediction over val.list, per-case dice/hd95/asd/
sensitivity/specificity with mean+std table and a
test_results_labelnum{N}.txt artifact."""

from __future__ import annotations

import argparse
import os

import jax

from ..config import make_config
from ..data import ISLESDataset
from ..eval import WholeVolumeInference, iter_h5_volumes, test_all_case_wholevolume
from ..models import net_factory_3d
from ..train.state import create_train_state, make_optimizer
from ..utils import checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root_dir", type=str, default="../data/ISLES22")
    p.add_argument("--exp", type=str, default="ISLES22")
    p.add_argument("--model", type=str, default="unet_3D")
    p.add_argument("--labelnum", type=int, default=10)
    p.add_argument("--temp", type=float, default=0.6)
    p.add_argument("--consistency_type", type=str, default="mse")
    p.add_argument("--max_iterations", type=int, default=20000)
    p.add_argument("--in_ch", type=int, default=1)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--feature_scaler", type=int, default=4)
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 64])
    p.add_argument("--snapshot_root", type=str, default="./runs")
    p.add_argument("--gpu_id", type=str, default="0")
    p.add_argument("--compute_dtype", type=str, default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--layout", type=str, default="auto",
                   choices=["auto", "NDHWC", "NCDHW"])
    p.add_argument("--patch_batch", type=int, default=0)  # accepted for symmetry
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard eval volumes round-robin over the first N "
                        "devices (0/1 = single device)")
    p.add_argument("--group", type=int, default=0,
                   help="batch N same-shape volumes per forward "
                        "(0 = auto: 4 on TPU, 1 elsewhere); exact vs ungrouped")
    args = p.parse_args(argv)
    from .test_pancreas import resolve_perf_flags

    dt, layout, _, _ = resolve_perf_flags(args)

    cfg = make_config(
        "isles22", exp=args.exp, model=args.model, labelnum=args.labelnum,
        temp=args.temp, consistency_type=args.consistency_type,
        max_iterations=args.max_iterations, in_ch=args.in_ch,
        feature_scaler=args.feature_scaler, snapshot_root=args.snapshot_root,
    )
    snapshot_path = cfg.snapshot_path()
    model = net_factory_3d(args.model, in_chns=args.in_ch, class_num=args.num_classes,
                           scaler=args.feature_scaler, compute_dtype=dt, layout=layout)
    template = create_train_state(model, jax.random.key(0), make_optimizer(lambda s: 0.0))
    ckpt_path = checkpoint.best_checkpoint_path(snapshot_path, args.model)
    state = checkpoint.restore_checkpoint(ckpt_path, template)
    print(f"Loading best model from: {ckpt_path}")

    ds = ISLESDataset(args.root_dir, split="val")
    devices = None
    if args.data_parallel > 1:
        devices = jax.devices()[: args.data_parallel]
        print(f"Volume-parallel eval over {len(devices)} devices")
    wv = WholeVolumeInference(model, tuple(args.patch_size), devices=devices)
    results_file = os.path.join(snapshot_path, f"test_results_labelnum{args.labelnum}.txt")
    on_tpu = jax.devices()[0].platform == "tpu"
    group = args.group or (4 if on_tpu else 1)
    summary = test_all_case_wholevolume(
        wv, state.params, state.model_state,
        iter_h5_volumes(ds.paths, label_key="mask"),
        results_path=results_file, group=group,
    )
    print("=" * 60)
    print("TESTING RESULTS FOR ISLES22")
    print("=" * 60)
    print(f"{'Metric':<12} | {'Mean':<8} | {'Std':<8}")
    for k in ("dice", "hd95", "asd", "sensitivity", "specificity"):
        print(f"{k.upper():<12} | {summary[k]:<8.4f} | {summary[k + '_std']:<8.4f}")
    print("=" * 60)
    return summary


if __name__ == "__main__":
    main()
