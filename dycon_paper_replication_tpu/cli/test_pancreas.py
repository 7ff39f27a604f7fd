"""Offline Pancreas-CT evaluation (reference test_Pancreas.py): load the
best checkpoint for the flag-derived snapshot path, dense sliding-window
eval (patch 96^3, stride_xy 16, stride_z 4) over test1.list, print the
per-case and average Dice/Jaccard/HD95/ASD table."""

from __future__ import annotations

import argparse
import os

import jax

from ..config import make_config
from ..eval import SlidingWindowInference, iter_h5_volumes, test_all_case
from ..models import net_factory_3d
from ..train.state import create_train_state, make_optimizer
from ..utils import checkpoint


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--root_path", type=str, default="../data/Pancreas")
    p.add_argument("--exp", type=str, default="PancreasCT")
    p.add_argument("--model", type=str, choices=["unet_3D", "vnet"], default="unet_3D")
    p.add_argument("--detail", type=int, default=1)
    p.add_argument("--nms", type=int, default=1)
    p.add_argument("--labelnum", type=int, default=12)
    p.add_argument("--gamma", type=float, default=2.0)
    p.add_argument("--beta_min", type=float, default=0.5)
    p.add_argument("--beta_max", type=float, default=5.0)
    p.add_argument("--s_beta", type=float, default=None)
    p.add_argument("--temp", type=float, default=0.6)
    p.add_argument("--use_focal", type=int, default=1)
    p.add_argument("--use_teacher_loss", type=int, default=1)
    p.add_argument("--consistency_type", type=str, default="mse")
    p.add_argument("--max_iterations", type=int, default=20000)
    p.add_argument("--in_ch", type=int, default=1)
    p.add_argument("--feature_scaler", type=int, default=2)
    p.add_argument("--snapshot_root", type=str, default="./runs")
    p.add_argument("--patch_size", type=int, nargs=3, default=[96, 96, 96])
    p.add_argument("--stride_xy", type=int, default=16)
    p.add_argument("--stride_z", type=int, default=4)
    p.add_argument("--gpu_id", type=str, default="0")
    p.add_argument("--list_name", type=str, default="test1.list")
    # performance knobs (reference test_Pancreas.py:67-70 runs the dense
    # protocol one f32 patch at a time; these default to the same
    # bf16 + NCDHW + batched-patch stack the bench/train paths use on
    # TPU, and to f32/NDHWC on CPU so metric goldens are unchanged)
    p.add_argument("--compute_dtype", type=str, default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--layout", type=str, default="auto",
                   choices=["auto", "NDHWC", "NCDHW", "folded"])
    p.add_argument("--patch_batch", type=int, default=0,
                   help="patches per forward; 0 = auto (8 on TPU, 2 elsewhere)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard patch chunks over N devices (0 = single device); "
                        "exact vs single-device (one psum pair per volume)")
    p.add_argument("--group", type=int, default=0,
                   help="pack N consecutive same-shape volumes per device program "
                        "(0 = auto: 8 on TPU, 1 elsewhere); exact vs ungrouped — "
                        "fills forward chunks across volume boundaries")
    return p


def resolve_perf_flags(args):
    """(compute_dtype, layout, patch_batch, transfer_dtype) resolved
    against the actual backend: bf16+NCDHW+batch-8+f16-transfer on TPU,
    f32+NDHWC+batch-2 elsewhere."""
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.devices()[0].platform == "tpu"
    dt = {
        "auto": jnp.bfloat16 if on_tpu else jnp.float32,
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
    }[args.compute_dtype]
    if args.layout == "auto":
        # folded (fold-2 packed pipeline) only exists for the 2-class
        # unet_3D; the sliding-window engine falls back per volume when a
        # patch grid isn't fold-2 aligned, so it's always safe to pick
        layout = ("folded" if args.model == "unet_3D" else "NCDHW") if on_tpu else "NDHWC"
    else:
        layout = args.layout
    patch_batch = args.patch_batch or (8 if on_tpu else 2)
    transfer = np.float16 if dt == jnp.bfloat16 else np.float32
    return dt, layout, patch_batch, transfer


def run_test(args, dataset: str, volume_iter) -> tuple:
    cfg = make_config(
        dataset,
        exp=args.exp, model=args.model, labelnum=args.labelnum, gamma=args.gamma,
        beta_min=args.beta_min, beta_max=args.beta_max, s_beta=args.s_beta,
        temp=args.temp, use_focal=args.use_focal, use_teacher_loss=args.use_teacher_loss,
        consistency_type=args.consistency_type, max_iterations=args.max_iterations,
        in_ch=args.in_ch, feature_scaler=args.feature_scaler,
        snapshot_root=args.snapshot_root,
    )
    snapshot_path = cfg.snapshot_path()
    dt, layout, patch_batch, transfer = resolve_perf_flags(args)
    model = net_factory_3d(args.model, in_chns=args.in_ch, class_num=cfg.num_classes,
                           scaler=args.feature_scaler, compute_dtype=dt, layout=layout)
    template = create_train_state(model, jax.random.key(0), make_optimizer(lambda s: 0.0))
    ckpt_path = checkpoint.best_checkpoint_path(snapshot_path, args.model)
    state = checkpoint.restore_checkpoint(ckpt_path, template)
    print(f"init weight from {ckpt_path}")

    mesh = None
    if getattr(args, "data_parallel", 0) and args.data_parallel > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel)
    sw = SlidingWindowInference(model, tuple(args.patch_size), args.stride_xy, args.stride_z,
                                patch_batch=patch_batch, transfer_dtype=transfer, mesh=mesh)
    save_path = os.path.join(snapshot_path, f"{args.exp}_predictions")
    on_tpu = jax.devices()[0].platform == "tpu"
    group = getattr(args, "group", 0) or (8 if on_tpu else 1)
    avg = test_all_case(
        sw, state.params, state.model_state, volume_iter,
        nms=bool(args.nms), metric_detail=bool(args.detail), test_save_path=save_path,
        group=group,
    )
    print("=" * 60)
    print("FINAL AVERAGE METRICS:")
    print(f"{'Dice':<8} {'Jaccard':<8} {'HD95':<8} {'ASD':<8}")
    print(f"{avg[0]:<8.5f} {avg[1]:<8.5f} {avg[2]:<8.5f} {avg[3]:<8.5f}")
    print("=" * 60)
    return tuple(avg)


def main(argv=None):
    args = build_parser().parse_args(argv)
    with open(os.path.join(args.root_path, args.list_name)) as f:
        names = [l.strip() for l in f if l.strip()]
    paths = [os.path.join(args.root_path, "Pancreas_data", n) for n in names]
    return run_test(args, "pancreas", iter_h5_volumes(paths))


if __name__ == "__main__":
    main()
