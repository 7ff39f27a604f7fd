"""Single dataclass config + argparse shim.

One `TrainConfig` drives all three dataset trainers; the reference's
three near-identical argparse blocks (train_DyCON_{BraTS19,Pancreas,
ISLES22}.py) become per-dataset default sets over the same schema, with
identical flag names/defaults so launch scripts port 1:1. The silent
in-code overrides the reference applies (e.g. BraTS hardcodes
patch_size=(96,96,96) and num_classes=2 over the CLI values,
train_DyCON_BraTS19.py:146-147) are explicit defaults here.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Sequence


@dataclasses.dataclass
class TrainConfig:
    # paths / experiment
    root_dir: str = "../data/Pancreas"
    exp: str = "PancreasCT"
    model: str = "unet_3D"
    dataset: str = "pancreas"  # pancreas | brats19 | isles22
    snapshot_root: str = "./runs"

    # reproducibility. deterministic=1 (default): every RNG stream
    # derives from `seed` and reruns are bit-identical. deterministic=0
    # mirrors the reference's cudnn.benchmark mode (non-reproducible
    # runs, train_DyCON_Pancreas.py:86-96): the trainer draws the seed
    # from OS entropy and logs it.
    seed: int = 1337
    deterministic: int = 1

    # model
    in_ch: int = 1
    num_classes: int = 2
    feature_scaler: int = 2
    use_aspp: bool = False
    patch_size: tuple[int, int, int] = (112, 112, 96)

    # optimization
    max_iterations: int = 20000
    batch_size: int = 8
    labeled_bs: int = 4
    base_lr: float = 0.01
    lr_schedule: str = "const"  # const | poly (ISLES)
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip_norm: float = 1.0

    # SSL
    labelnum: int = 12
    ema_decay: float = 0.99
    consistency: float = 0.1
    consistency_type: str = "mse"  # mse | kl
    consistency_rampup: float = 200.0

    # DyCON
    gamma: float = 2.0
    beta_min: float = 0.5
    beta_max: float = 5.0
    s_beta: float | None = None
    temp: float = 0.6
    l_weight: float = 1.0
    u_weight: float = 0.5
    use_focal: int = 1
    use_teacher_loss: int = 1
    fecl_rampup_epochs: float = 1500.0
    # FeCL row-chunk size: 0 = dense (B,N,N) matrices; >0 = flash-style
    # chunked evaluation, O(B*chunk*N) memory (use for large feature grids)
    fecl_chunk: int = 0
    # chunked-FeCL backward: "fused" = analytic custom-VJP (one backward
    # tile pass, ops/fecl_fused.py); "chunked" = jax.checkpoint recompute.
    # Only consulted when fecl_chunk > 0.
    fecl_impl: str = "fused"

    # dataset-behavior switches (the ISLES trainer deltas)
    teacher_train_mode: bool = True  # BraTS/Pancreas run teacher w/ dropout; ISLES eval
    dice_loss_kind: str = "binary"  # binary (fg-prob dice) | nclass (ISLES DiceLoss)
    mask_kernel_mode: str = "fixed"  # fixed: feature_scaler*4; derived: from shapes

    # eval cadence
    val_every: int = 200
    save_every: int = 3000
    val_stride_xy: int = 64
    val_stride_z: int = 64

    # runtime
    compute_dtype: str = "float32"  # float32 | bfloat16
    num_prefetch: int = 2
    data_parallel: int = 0  # 0 = all visible devices
    # resume: "" = fresh run; "auto" = restore this run-dir's LATEST
    # checkpoint (highest-step periodic/best save — what a preempted run
    # wants); otherwise a checkpoint directory path. Restores the FULL
    # TrainState (student, teacher, optimizer momentum, step).
    resume: str = ""
    # wall-clock budget in seconds (0 = unlimited): the trainer exits
    # the loop cleanly once exceeded, saving a final periodic checkpoint
    # so the run is resumable. A clean bound beats an external
    # `timeout` kill, which can wedge the TPU relay (CLAUDE.md).
    time_budget_s: float = 0.0
    # host-RSS watchdog (GB, 0 = disabled): when the process's resident
    # set crosses this bar the trainer saves a periodic checkpoint and
    # exits cleanly (same resumable path as time_budget_s) instead of
    # being OOM-killed mid-step. Motivated by a measured ~28.5 MB/iter
    # host-RSS creep on the relay-tunneled v5e (exactly one batch's
    # f16+u8 wire bytes per step — H2D staging retained inside the
    # remote-device plugin, outside this process's control): a 20k-iter
    # canonical run was OOM-killed at iteration 8548 with 130 GB
    # anon-RSS. The trainer also deletes consumed batch device buffers
    # and runs periodic gc (trainer.py) to keep what IS controllable
    # bounded.
    host_rss_exit_gb: float = 100.0
    # host-loop pipelining: with fetch_ahead=1 (the default — measured
    # -7.6% wall/iter on the v5e and proven bit-identical to the sync
    # loop by tests/test_train.py) the trainer dispatches iteration N+1
    # BEFORE fetching iteration N's scalar metrics, hiding the D2H
    # round-trip latency behind the next step's compute (on a
    # high-latency host link the per-iteration blocking fetch dominates
    # the 416 ms device step). Iterations that must be observed in sync
    # (val/save/monitor/HD95 cadence, the final step, budget exits)
    # fetch synchronously, and the sync decision is made AFTER the
    # previous iteration's fetch (from the true index), so checkpoints
    # and val always see exactly the reference's state even across
    # NaN-skipped steps. Observable deviations, both only after a NaN
    # skip (healthy runs never skip): the ALREADY-DISPATCHED next step
    # used a consistency weight computed one iteration ahead, and one
    # HD95/monitor telemetry sample may be dropped (the shifted step was
    # already dispatched as the light twin). 0 = fetch every iteration
    # synchronously.
    fetch_ahead: int = 1
    # "always": every step materializes the diagnostic outputs
    # (pred_fg_bits for train-HD95, embedding/mask_con for the
    # similarity monitor). "cadence" (the default — materializing
    # diagnostics every step cost ~64 ms/step of HBM writes, -14%
    # device time, BASELINE.md): compile a second, LIGHT step without
    # those outputs and dispatch the full one only on the iterations
    # that consume them (every hd95_every / 200 iters).
    step_diagnostics: str = "cadence"
    # gradient rematerialization: "none" stores all forward activations
    # for backward; "full" recomputes the student forward during the
    # backward pass (~+30% step FLOPs, ~forward-only peak memory) —
    # required for the full-size patch configs on 16GB-HBM chips
    remat: str = "none"
    # internal model tensor layout. NCDHW keeps the W axis (not the
    # C<128 axis) in the TPU lane dim: backward residuals avoid up to 8x
    # lane padding, which is what lets the reference's batch-8 full-patch
    # configs fit in 16GB HBM. "folded" runs the small-channel U-Net
    # levels in fold-2 space-to-depth execution (ops/folding.py) —
    # measured 1.9x faster per train step than NCDHW on v5e. All
    # numerically identical to NDHWC. "auto" = folded for unet_3D on
    # TPU, NCDHW for other models on TPU, NDHWC elsewhere.
    layout: str = "auto"
    # dtype of the host->device batch transfer: "auto" = f16 images + u8
    # labels on TPU (halves H2D bytes; the step widens to f32/i32 on
    # device), full-width f32/i32 elsewhere. "float32" forces full width.
    wire_dtype: str = "auto"

    def resolved_layout(self) -> str:
        """Concrete model layout for this config ("auto" resolved against
        the active JAX backend; the n_classes==2 requirement of the folded
        eval fast path is NOT required here — folded training works for
        any class count)."""
        if self.layout != "auto":
            return self.layout
        import jax

        if jax.devices()[0].platform != "tpu":
            return "NDHWC"
        # both model families have fold-2 engines; measured wins on the
        # v5e: unet_3D 506 vs 955 ms/step, vnet 289.9 vs 574.5 (BASELINE.md)
        return "folded" if self.model in ("unet_3D", "vnet") else "NCDHW"

    def snapshot_path(self) -> str:
        """Hyperparameter-encoded run directory. Mirrors the reference's
        two conventions: the BraTS/Pancreas style (train_DyCON_Pancreas
        .py:71-75) and the distinct ISLES style (train_DyCON_ISLES22
        .py:93-94), so checkpoints are addressable by config alone."""
        if self.dataset == "isles22":
            return (
                f"{self.snapshot_root}/{self.exp}/DyCON_{self.model}_"
                f"{self.consistency_type}_temp{self.temp}_labelnum{self.labelnum}"
                f"_max_iterations{self.max_iterations}"
            )
        beta_str = f"_beta{self.s_beta}" if self.s_beta is not None else f"_beta{self.beta_min}-{self.beta_max}"
        focal_str = "Focal" if self.use_focal else "NoFocal"
        gamma_str = f"_gamma{self.gamma}" if self.use_focal else ""
        teacher_str = "Teacher" if self.use_teacher_loss else "NoTeacher"
        return (
            f"{self.snapshot_root}/{self.exp}/{self.model.upper()}_{self.labelnum}labels_"
            f"{self.consistency_type}{gamma_str}_{focal_str}_{teacher_str}_temp{self.temp}"
            f"{beta_str}_max_iterations{self.max_iterations}"
        )


DATASET_DEFAULTS: dict[str, dict[str, Any]] = {
    "pancreas": dict(
        root_dir="../data/Pancreas", exp="PancreasCT", dataset="pancreas",
        patch_size=(112, 112, 96), feature_scaler=2, labelnum=12,
        batch_size=8, labeled_bs=4, lr_schedule="const",
        teacher_train_mode=True, dice_loss_kind="binary", mask_kernel_mode="fixed",
        # remat defaults to "none": folded bf16 activations fit the 16GB
        # v5e at canonical geometry and the step is 17-30% faster
        # (Pancreas 498.9->416.3, BraTS 470->329.8 ms; BASELINE.md). The
        # round-1 OOM that forced remat=full was NDHWC f32.
    ),
    "brats19": dict(
        root_dir="../data/BraTS2019", exp="BraTS2019", dataset="brats19",
        patch_size=(96, 96, 96), feature_scaler=2, labelnum=25,
        batch_size=8, labeled_bs=4, lr_schedule="const",
        teacher_train_mode=True, dice_loss_kind="binary", mask_kernel_mode="fixed",
    ),
    "isles22": dict(
        root_dir="../data/ISLES22", exp="ISLES22", dataset="isles22",
        patch_size=(96, 96, 64), feature_scaler=4, labelnum=10,
        batch_size=8, labeled_bs=4, lr_schedule="poly",
        teacher_train_mode=False, dice_loss_kind="nclass", mask_kernel_mode="derived",
        # ISLES feature grid is (24,24,16) -> N=9216; dense FeCL would
        # materialize ~170M-element (B,N,N) tensors (SURVEY.md §3.2)
        fecl_chunk=512,
    ),
}


def make_config(dataset: str, **overrides: Any) -> TrainConfig:
    kw = dict(DATASET_DEFAULTS[dataset])
    kw.update(overrides)
    return TrainConfig(**kw)


def build_parser(dataset: str) -> argparse.ArgumentParser:
    """Argparse shim with the reference's flag names over TrainConfig."""
    d = make_config(dataset)
    p = argparse.ArgumentParser(description=f"Training DyCON-TPU on {d.exp}")
    p.add_argument("--root_dir", type=str, default=d.root_dir)
    p.add_argument("--exp", type=str, default=d.exp)
    p.add_argument("--model", type=str, choices=["unet_3D", "vnet"], default=d.model)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--deterministic", type=int, default=d.deterministic)
    p.add_argument("--in_ch", type=int, default=d.in_ch)
    p.add_argument("--num_classes", type=int, default=d.num_classes)
    p.add_argument("--feature_scaler", type=int, default=d.feature_scaler)
    p.add_argument("--use_aspp", type=int, default=int(d.use_aspp),
                   help="ASPP on the bottleneck before the projection head")
    p.add_argument("--patch_size", type=int, nargs=3, default=list(d.patch_size))
    p.add_argument("--max_iterations", type=int, default=d.max_iterations)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--labeled_bs", type=int, default=d.labeled_bs)
    p.add_argument("--base_lr", type=float, default=d.base_lr)
    p.add_argument("--labelnum", type=int, default=d.labelnum)
    p.add_argument("--ema_decay", type=float, default=d.ema_decay)
    p.add_argument("--consistency", type=float, default=d.consistency)
    p.add_argument("--consistency_type", type=str, default=d.consistency_type)
    p.add_argument("--consistency_rampup", type=float, default=d.consistency_rampup)
    p.add_argument("--gamma", type=float, default=d.gamma)
    p.add_argument("--beta_min", type=float, default=d.beta_min)
    p.add_argument("--beta_max", type=float, default=d.beta_max)
    p.add_argument("--s_beta", type=float, default=None)
    p.add_argument("--temp", type=float, default=d.temp)
    p.add_argument("--l_weight", type=float, default=d.l_weight)
    p.add_argument("--u_weight", type=float, default=d.u_weight)
    p.add_argument("--use_focal", type=int, default=d.use_focal)
    p.add_argument("--use_teacher_loss", type=int, default=d.use_teacher_loss)
    p.add_argument("--snapshot_root", type=str, default=d.snapshot_root)
    p.add_argument("--compute_dtype", type=str, default=d.compute_dtype,
                   choices=["float32", "bfloat16"])
    p.add_argument("--val_every", type=int, default=d.val_every)
    p.add_argument("--save_every", type=int, default=d.save_every)
    p.add_argument("--time_budget_s", type=float, default=d.time_budget_s,
                   help="wall-clock budget; 0 = unlimited (clean exit + resumable ckpt)")
    p.add_argument("--host_rss_exit_gb", type=float, default=d.host_rss_exit_gb,
                   help="host-RSS bar; crossing it saves + exits cleanly (0 = off)")
    p.add_argument("--fetch_ahead", type=int, default=d.fetch_ahead, choices=[0, 1],
                   help="1 = defer each iteration's metric fetch behind the next dispatch")
    p.add_argument("--step_diagnostics", type=str, default=d.step_diagnostics,
                   choices=["always", "cadence"],
                   help="cadence = light step (scalars only) off the monitor/HD95 cadence")
    p.add_argument("--data_parallel", type=int, default=d.data_parallel)
    p.add_argument("--resume", type=str, default=d.resume,
                   help='"" fresh, "auto" = latest ckpt of this run dir, or a path')
    p.add_argument("--remat", type=str, default=d.remat, choices=["none", "full"])
    p.add_argument("--wire_dtype", type=str, default=d.wire_dtype,
                   choices=["auto", "float32", "float16"])
    p.add_argument("--layout", type=str, default=d.layout,
                   choices=["auto", "NDHWC", "NCDHW", "folded"])
    p.add_argument("--fecl_chunk", type=int, default=d.fecl_chunk)
    p.add_argument("--fecl_impl", type=str, default=d.fecl_impl,
                   choices=["fused", "chunked"])
    # kept for launch-script compatibility; device selection is JAX's
    p.add_argument("--gpu_id", type=str, default="0")
    p.add_argument("--gpu_ids", type=str, default="0")
    p.add_argument("--use_ddp", type=int, default=0)
    return p


def config_from_args(dataset: str, argv: Sequence[str] | None = None) -> TrainConfig:
    args = build_parser(dataset).parse_args(argv)
    field_names = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in vars(args).items() if k in field_names}
    kw["patch_size"] = tuple(kw["patch_size"])
    return make_config(dataset, **kw)
