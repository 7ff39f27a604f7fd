"""Unified DyCON trainer.

The reference ships three ~85%-identical training scripts
(train_DyCON_{Pancreas,BraTS19,ISLES22}.py); here one `Trainer` drives
all three datasets from a `TrainConfig`, with the ISLES deltas (teacher
eval-mode, poly LR, n-class dice, derived mask kernel, whole-volume
validation) expressed as config switches (SURVEY.md §7 step 6).

Division of labor:
  * device (one jitted program per step, `train/step.py`): forwards,
    losses, grads, clip, SGD, EMA, NaN guard, train Dice;
  * host (this file): schedules (per-epoch beta / FeCL thresholds,
    per-iter consistency weight), data prefetch, logging, periodic
    validation + checkpointing.
The reference's per-iteration host work (medpy HD95 per batch,
train_DyCON_Pancreas.py:287-292 — a D2H sync + CPU EDT every step) runs
every `hd95_every` iterations instead; train Dice stays per-step but on
device.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data import (
    BatchLoader,
    BraTS2019,
    Compose,
    ISLESDataset,
    Pancreas,
    RandomRotFlip,
    ToArray,
    TwoStreamBatchSampler,
)
from ..eval import (
    SlidingWindowInference,
    WholeVolumeInference,
    iter_h5_volumes,
    var_all_case,
    var_all_case_wholevolume,
)
from ..models import net_factory_3d
from ..ops import metrics, ramps
from ..parallel import make_mesh, batch_sharding, replicate
from ..utils import ExperimentLogger, checkpoint
from ..utils.monitor import monitor_similarity_distributions
from ..utils.profiling import StepTimer
from .state import create_train_state, make_optimizer
from .step import SCALAR_METRICS, StepScalars, build_train_step

# ISLES-2022 labelnum (patients) -> number of labeled training volumes
# (train_DyCON_ISLES22.py:124-135)
ISLES_PATIENTS_TO_SLICES = {
    1: 36, 2: 38, 3: 27, 4: 53, 5: 60, 6: 25, 7: 25, 8: 38, 9: 38, 10: 45,
    11: 27, 12: 29, 13: 32, 14: 29, 15: 44, 16: 38, 17: 29, 18: 23, 19: 48,
    20: 42, 21: 31, 22: 48, 23: 42, 24: 23, 25: 29,
}


def _compute_dtype(cfg: TrainConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


_PAGE_GB = os.sysconf("SC_PAGE_SIZE") / 1024**3 if hasattr(os, "sysconf") else 0.0


def _host_rss_gb() -> float:
    """This process's resident set in GB (0.0 where /proc is absent).
    One small read — cheap enough for an every-20-iterations watchdog."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * _PAGE_GB
    except (OSError, ValueError, IndexError):
        return 0.0


class Trainer:
    def __init__(self, cfg: TrainConfig):
        if cfg.data_parallel > 1:
            # explicit device count: mirror the reference's DataParallel
            # semantics — keep the devices, adjust batches, scale LR
            self.mesh = make_mesh(cfg.data_parallel)
            cfg, multi_device_notes = self._apply_multi_device_rules(cfg, self.mesh.size)
        else:
            # auto (data_parallel=0): GSPMD over all devices; clamp the
            # mesh to divide the batch instead of touching the config
            self.mesh = make_mesh(cfg.data_parallel, cfg.batch_size)
            multi_device_notes = []
        if not cfg.deterministic:
            # the reference's deterministic=0 turns on cudnn.benchmark,
            # making runs non-reproducible in exchange for speed
            # (train_DyCON_Pancreas.py:86-96); the honest JAX analogue of
            # "this run is not reproducible" is an entropy-drawn seed
            seed = int.from_bytes(os.urandom(4), "little")
            multi_device_notes.append(
                f"deterministic=0: seed drawn from OS entropy -> {seed}"
            )
            cfg = dataclasses.replace(cfg, seed=seed)
        self.cfg = cfg
        self.snapshot_path = cfg.snapshot_path()
        os.makedirs(self.snapshot_path, exist_ok=True)
        self.log = ExperimentLogger(self.snapshot_path)
        for note in multi_device_notes:
            self.log.info(note)
        self.log.info(str(dataclasses.asdict(cfg)))
        with open(os.path.join(self.snapshot_path, "config.json"), "w") as f:
            json.dump({k: str(v) for k, v in dataclasses.asdict(cfg).items()}, f, indent=2)
        self._snapshot_code()

        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicate(self.mesh)

        self.model = net_factory_3d(
            cfg.model, in_chns=cfg.in_ch, class_num=cfg.num_classes,
            scaler=cfg.feature_scaler, use_aspp=cfg.use_aspp,
            compute_dtype=_compute_dtype(cfg),
            layout=cfg.resolved_layout(),
        )

        if cfg.lr_schedule == "poly":
            schedule = lambda step: cfg.base_lr * (1.0 - step / cfg.max_iterations) ** 0.9
        else:
            schedule = lambda step: cfg.base_lr
        self.optimizer = make_optimizer(
            schedule, cfg.momentum, cfg.weight_decay, cfg.grad_clip_norm
        )

        self.state = create_train_state(self.model, jax.random.key(cfg.seed), self.optimizer)
        self._resumed_best = 0.0
        if cfg.resume:
            if cfg.resume == "auto":
                path, self._resumed_best = checkpoint.latest_checkpoint_path(
                    self.snapshot_path, cfg.model
                )
            else:
                path = cfg.resume
            self.state = checkpoint.restore_checkpoint(path, self.state)
            self.log.info(
                "Resumed full TrainState from %s (step %d, best-so-far %.4f)",
                path, int(self.state.step), self._resumed_best,
            )
        self.state = jax.device_put(self.state, self._replicated)

        step_fn = build_train_step(self.model, self.optimizer, cfg)
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))
        # LIGHT twin (scalars only) for off-cadence iterations; same
        # update semantics, just no diagnostic outputs to materialize
        self.train_step_light = (
            jax.jit(
                build_train_step(self.model, self.optimizer, cfg, diagnostics=False),
                donate_argnums=(0,),
            )
            if cfg.step_diagnostics == "cadence"
            else self.train_step
        )
        # on-device TrainState copy for async checkpointing: the live
        # state is donated to the next step, so the background save
        # thread gets fresh buffers (jit outputs never alias inputs
        # without explicit donation); costs one HBM round trip (~ms)
        self._copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

        self._build_data()
        self._build_eval()
        self.timer = StepTimer()
        self.best_performance = self._resumed_best
        self.hd95_every = max(cfg.val_every // 4, 1)

    @staticmethod
    def _apply_multi_device_rules(
        cfg: TrainConfig, n_dev: int
    ) -> tuple[TrainConfig, list[str]]:
        """The reference's DataParallel adjustments
        (train_DyCON_BraTS19.py:93-110) under SPMD data parallelism:
        round batch_size and labeled_bs DOWN to multiples of the mesh
        size, and linearly scale the learning rate by the mesh size.
        Rounding either batch to zero is an error here (the reference
        would silently train with an empty labeled slice)."""
        notes: list[str] = []
        if n_dev <= 1:
            return cfg, notes
        bs = (cfg.batch_size // n_dev) * n_dev
        lbs = (cfg.labeled_bs // n_dev) * n_dev
        if bs == 0 or lbs == 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} / labeled_bs={cfg.labeled_bs} "
                f"round to zero over {n_dev} devices; shrink data_parallel "
                "or grow the batch"
            )
        if bs != cfg.batch_size:
            notes.append(
                f"Adjusted total batch size from {cfg.batch_size} to {bs} "
                f"to be divisible by {n_dev} devices"
            )
        if lbs != cfg.labeled_bs:
            notes.append(
                f"Adjusted labeled batch size from {cfg.labeled_bs} to {lbs} "
                f"to be divisible by {n_dev} devices"
            )
        lr = cfg.base_lr * n_dev
        notes.append(f"Scaled learning rate to {lr} for {n_dev} devices")
        return dataclasses.replace(cfg, batch_size=bs, labeled_bs=lbs, base_lr=lr), notes

    def _snapshot_code(self) -> None:
        """Copy the framework source next to the checkpoints so every run
        is reproducible from its own directory (the reference copies its
        code/ tree per run, train_DyCON_Pancreas.py:127-130)."""
        import shutil

        src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(self.snapshot_path, "code")
        if not os.path.exists(dst):
            shutil.copytree(
                src, dst, ignore=shutil.ignore_patterns("__pycache__", "*.pyc")
            )

    # ---------------- data ----------------

    def _build_data(self) -> None:
        cfg = self.cfg
        transform = Compose([RandomRotFlip(), ToArray()])
        if cfg.dataset == "pancreas":
            ds = Pancreas(cfg.root_dir, split="train", transform=transform,
                          crop_size=cfg.patch_size)
            labeled = cfg.labelnum
        elif cfg.dataset == "brats19":
            ds = BraTS2019(cfg.root_dir, split="train", transform=transform,
                           crop_size=cfg.patch_size)
            labeled = cfg.labelnum
        elif cfg.dataset == "isles22":
            ds = ISLESDataset(cfg.root_dir, split="train", transform=transform,
                              crop_size=cfg.patch_size)
            labeled = ISLES_PATIENTS_TO_SLICES.get(cfg.labelnum, cfg.labelnum)
        else:
            raise ValueError(cfg.dataset)
        if labeled >= len(ds):
            raise ValueError(f"labelnum {labeled} >= dataset size {len(ds)}")
        self.dataset = ds
        self.n_labeled = labeled
        sampler = TwoStreamBatchSampler(
            range(labeled), range(labeled, len(ds)),
            cfg.batch_size, cfg.batch_size - cfg.labeled_bs, seed=cfg.seed,
        )
        on_tpu = jax.devices()[0].platform == "tpu"
        half_wire = cfg.wire_dtype == "float16" or (cfg.wire_dtype == "auto" and on_tpu)
        self.loader = BatchLoader(
            ds, sampler, seed=cfg.seed, prefetch=cfg.num_prefetch,
            device_put=lambda b: {k: jax.device_put(v, self._batch_sharding) for k, v in b.items()},
            image_dtype=np.float16 if half_wire else np.float32,
            label_dtype=np.uint8 if half_wire else np.int32,
        )
        self.iters_per_epoch = len(sampler)
        self.max_epoch = cfg.max_iterations // self.iters_per_epoch + 1
        self.log.info("%d Iterations per epoch", self.iters_per_epoch)

    def _build_eval(self) -> None:
        cfg = self.cfg
        if cfg.dataset == "isles22":
            # head="sdf": the reference's ISLES validation argmaxes the
            # tanh SDF head (train_DyCON_ISLES22.py:364) — checkpoint
            # selection must match it (offline test uses the seg head)
            self.whole_volume = WholeVolumeInference(self.model, cfg.patch_size, head="sdf")
            self.sw = None
        else:
            self.whole_volume = None
            self.sw = SlidingWindowInference(
                self.model, cfg.patch_size, cfg.val_stride_xy, cfg.val_stride_z
            )

    def _val_volumes(self) -> Iterable:
        cfg = self.cfg
        if cfg.dataset == "pancreas":
            # reference validates on test1.list and fails loudly when it is
            # missing (test_3d_patch.py:119-121) — no silent substitution
            p = os.path.join(cfg.root_dir, "test1.list")
            with open(p) as f:
                names = [l.strip() for l in f if l.strip()]
            paths = [os.path.join(cfg.root_dir, "Pancreas_data", n) for n in names]
            return iter_h5_volumes(paths)
        if cfg.dataset == "brats19":
            with open(os.path.join(cfg.root_dir, "val.txt")) as f:
                names = [l.strip() for l in f if l.strip()]
            paths = [os.path.join(cfg.root_dir, "data", f"{n}.h5") for n in names]
            return iter_h5_volumes(paths, axial_transpose=True)
        ds = ISLESDataset(cfg.root_dir, split="val")
        return iter_h5_volumes(ds.paths, label_key="mask")

    # ---------------- schedules ----------------

    def _epoch_scalars(self, epoch: int) -> tuple[float, float, float]:
        cfg = self.cfg
        if cfg.s_beta is not None:
            beta = cfg.s_beta
        else:
            beta = ramps.adaptive_beta(epoch, self.max_epoch, cfg.beta_max, cfg.beta_min)
        pos_th = ramps.threshold_rampup(epoch, cfg.fecl_rampup_epochs, 1.3, 1.5)
        neg_th = ramps.threshold_rampup(epoch, cfg.fecl_rampup_epochs, 0.3, 0.5)
        return beta, pos_th, neg_th

    def _consistency_weight(self, iter_num: int) -> float:
        cfg = self.cfg
        return cfg.consistency * ramps.sigmoid_rampup(iter_num // 150, cfg.consistency_rampup)

    # ---------------- validation ----------------

    def validate(self) -> float:
        params, mstate = self.state.params, self.state.model_state
        on_tpu = jax.devices()[0].platform == "tpu"
        if self.whole_volume is not None:
            return var_all_case_wholevolume(self.whole_volume, params, mstate,
                                            self._val_volumes(),
                                            group=4 if on_tpu else 1)
        # group same-shape val volumes per device program: the coarse val
        # strides yield few patches per volume (BraTS: 9), so per-volume
        # dispatch pads nearly half the forward chunk slots
        return var_all_case(self.sw, params, mstate, self._val_volumes(),
                            group=4 if on_tpu else 1)

    # ---------------- main loop ----------------

    def _finish_step(self, m, scalars, batch, t_disp, iter_num: int) -> int:
        """Post-dispatch half of one training iteration: the blocking
        scalar fetch, NaN-skip accounting, cadence logging/monitoring,
        validation + checkpointing, and the stop checks. Split out of
        `run` so `fetch_ahead=1` can defer it behind the NEXT dispatch
        (the D2H round trip then overlaps the next step's compute).
        `t_disp` is this iteration's own dispatch timestamp (with
        fetch_ahead=1 another start() fires before a deferred stop()).
        Returns the updated iter_num; sets self._stop to end the run."""
        cfg = self.cfg
        # ONE host<->device round trip for all per-step scalars
        v = dict(zip(SCALAR_METRICS, np.asarray(m["scalars"]).tolist()))
        self.timer.stop(start=t_disp)
        if v["skipped"]:
            # reference `continue`s BEFORE iter_num += 1
            # (train_DyCON_Pancreas.py:261-263): a NaN step advances
            # neither state.step nor the schedules/cadence
            self.log.info(
                "NaN or Inf found in loss at iteration %d — skipped", iter_num
            )
            self._release_batch(batch)
            return iter_num
        iter_num += 1

        if iter_num % 200 == 0 and "embedding" in m:
            monitor_similarity_distributions(
                m["embedding"], m["mask_con"], iter_num,
                os.path.join(self.snapshot_path, f"{cfg.exp}_similarity"),
            )

        if (iter_num % self.hd95_every == 0 or iter_num == 1) and "pred_fg_bits" in m:
            label_np = np.asarray(batch["label"])
            # bit-packed wire (step.py _packbits): 32x fewer D2H bytes
            # than the f32 mask; unpack + strip the byte-align pad
            pred_fg = np.unpackbits(
                np.asarray(m["pred_fg_bits"]), axis=-1, bitorder="little"
            )[..., : label_np.shape[-1]]
            max_dist = float(np.linalg.norm(cfg.patch_size))
            hd = float(np.mean(metrics.compute_hd95_batch(pred_fg, label_np, max_dist)))
            self.log.scalar("train/HD95", hd, iter_num)

        self.log.scalars(
            {
                "info/loss": v["loss"],
                "info/f_loss": v["f_loss"],
                "info/u_loss": v["u_loss"],
                "info/loss_ce": v["loss_ce"],
                "info/loss_dice": v["loss_dice"],
                "info/consistency_loss": v["consistency_loss"],
                "info/consistency_weight": float(scalars.consistency_weight),
                "train/Dice": v["train_dice"],
            },
            iter_num,
        )
        self.log.info(
            "Iteration %d : Loss : %f, Loss_CE: %f, Loss_Dice: %f, "
            "UnCLoss: %f, FeCLoss: %f, mean_dice: %f",
            iter_num, v["loss"], v["loss_ce"], v["loss_dice"],
            v["u_loss"], v["f_loss"], v["train_dice"],
        )
        if iter_num > 0 and iter_num % cfg.val_every == 0:
            avg = self.validate()
            if avg > self.best_performance:
                self.best_performance = round(float(avg), 4)
                snap = self._copy_state(self.state)
                meta = {"step": iter_num, "best_dice": self.best_performance}
                checkpoint.save_checkpoint(
                    checkpoint.iter_checkpoint_path(
                        self.snapshot_path, iter_num, self.best_performance
                    ),
                    snap,
                    meta=meta,
                )
                checkpoint.save_checkpoint(
                    checkpoint.best_checkpoint_path(self.snapshot_path, cfg.model),
                    snap,
                    meta=meta,
                )
            self.log.scalars(
                {"info/Dice": float(avg), "info/Best_dice": self.best_performance},
                iter_num,
            )
            self.log.info(
                "Iteration %d : Dice: %f Best_dice: %f",
                iter_num, float(avg), self.best_performance,
            )
            for tag, tval in self.timer.stats().items():
                self.log.scalar(f"perf/{tag}", tval, iter_num)
            self.log.scalar("perf/host_rss_gb", _host_rss_gb(), iter_num)

        if iter_num % cfg.save_every == 0:
            checkpoint.save_checkpoint(
                checkpoint.iter_checkpoint_path(self.snapshot_path, iter_num),
                self._copy_state(self.state),
                meta={"step": iter_num, "best_dice": self.best_performance},
            )
        # this iteration's batch is fully consumed (the scalar fetch
        # above proves the step executed; HD95 read the label above):
        # free its device buffers NOW instead of waiting for GC — on the
        # relay-tunneled device the plugin stages every H2D host-side,
        # so a lazily-collected batch pins ~29 MB of host RAM
        self._release_batch(batch)
        if iter_num % 100 == 0:
            # large per-iteration objects (device-array wrappers, metric
            # dicts) can sit in reference cycles; gen-2 collections are
            # rare by default on allocation-light loops, so force one on
            # a cadence (~ms per call, amortized to noise)
            import gc

            gc.collect()
        if iter_num >= cfg.max_iterations:
            self._stop = True
        return iter_num

    @staticmethod
    def _release_batch(batch) -> None:
        """Eagerly free a consumed batch's device buffers (no-op for
        numpy/already-deleted values)."""
        for arr in batch.values():
            delete = getattr(arr, "delete", None)
            if delete is not None:
                try:
                    delete()
                except Exception:  # noqa: BLE001 — already-freed/donated
                    pass

    def run(self) -> float:
        import time as _time

        cfg = self.cfg
        t_start = _time.monotonic()
        iter_num = int(self.state.step)  # nonzero after resume
        key = jax.random.key(cfg.seed + 1)
        if iter_num:
            key = jax.random.fold_in(key, iter_num)
        start_epoch = iter_num // self.iters_per_epoch
        # continuous producer: one prefetch thread across epoch
        # boundaries (an "epoch" is only labelnum/labeled_bs batches);
        # epoch-level schedules recompute when the epoch index advances
        beta = pos_th = neg_th = None
        last_epoch = None
        # bound the stream at the reference's epoch budget: NaN-skipped
        # steps don't advance iter_num, so a permanently diverged run
        # would otherwise spin forever (the reference's for-epoch loop
        # terminates at max_epoch regardless)
        self._stop = False
        light_ok = cfg.step_diagnostics == "cadence"
        # pending = (metrics, scalars, batch, t_disp) of a dispatched-but
        # -not-yet-fetched iteration (fetch_ahead=1): its D2H round trip
        # overlaps the next step's compute instead of serializing with it
        pending = None
        for epoch_idx, batch in self.loader.epochs(max(1, self.max_epoch - start_epoch)):
            epoch = start_epoch + epoch_idx
            if epoch != last_epoch:
                beta, pos_th, neg_th = self._epoch_scalars(epoch)
                last_epoch = epoch
            # iteration index this dispatch lands on if no step is
            # NaN-skipped (skips only shift the light/full choice below;
            # _finish_step re-derives the true index at fetch time, and
            # the sync decision is re-made AFTER the pending drain)
            presumed = iter_num + 1 + (pending is not None)
            on_diag_cadence = (
                presumed % 200 == 0
                or presumed % self.hd95_every == 0
                or presumed == 1
            )
            scalars = StepScalars.make(
                beta, self._consistency_weight(presumed - 1), pos_th, neg_th
            )
            key, step_key = jax.random.split(key)
            t_disp = self.timer.start()
            step_fn = (
                self.train_step_light if (light_ok and not on_diag_cadence)
                else self.train_step
            )
            self.state, m = step_fn(self.state, batch, step_key, scalars)
            if pending is not None:
                iter_num = self._finish_step(*pending, iter_num)
                pending = None
                if self._stop:
                    break
            # sync decision from the TRUE landing index: if the drain
            # above observed a NaN skip, this dispatch lands one earlier
            # than `presumed` — deciding here keeps val/save/final-step
            # processing in exact lockstep with the state they must
            # observe (iterations whose processing must not be deferred:
            # val/save see exactly this step's state; the final step must
            # be observed before the loop can end). A post-skip shift can
            # still have dispatched a diag-cadence step as the LIGHT
            # twin — _finish_step then skips that one HD95/monitor
            # sample (telemetry only; healthy runs never skip).
            actual = iter_num + 1
            sync_now = (
                not cfg.fetch_ahead
                or actual % 200 == 0
                or actual % self.hd95_every == 0
                or actual == 1
                or actual % cfg.val_every == 0
                or actual % cfg.save_every == 0
                or actual >= cfg.max_iterations
            )
            if sync_now:
                iter_num = self._finish_step(m, scalars, batch, t_disp, iter_num)
                if self._stop:
                    break
            else:
                pending = (m, scalars, batch, t_disp)
            stop_reason = None
            if cfg.time_budget_s and _time.monotonic() - t_start >= cfg.time_budget_s:
                stop_reason = f"Time budget {cfg.time_budget_s:.0f}s exceeded"
            elif cfg.host_rss_exit_gb and iter_num % 20 == 0:
                rss = _host_rss_gb()
                if rss >= cfg.host_rss_exit_gb:
                    # the relay plugin leaks ~29 MB of host H2D staging
                    # per step (see config.host_rss_exit_gb): exit
                    # cleanly and resumably BEFORE the kernel OOM-kills
                    # the process mid-step (which forfeits up to
                    # save_every iterations and can wedge the relay)
                    stop_reason = (
                        f"Host RSS {rss:.1f} GB >= host_rss_exit_gb "
                        f"{cfg.host_rss_exit_gb:.0f}"
                    )
            if stop_reason:
                # clean resumable exit BEFORE the next step launches (an
                # external kill mid-program can wedge the TPU relay):
                # drain the in-flight iteration, save, stop
                if pending is not None:
                    iter_num = self._finish_step(*pending, iter_num)
                    pending = None
                checkpoint.save_checkpoint(
                    checkpoint.iter_checkpoint_path(self.snapshot_path, iter_num),
                    self._copy_state(self.state),
                    meta={"step": iter_num, "best_dice": self.best_performance},
                )
                self.log.info(
                    "%s at iteration %d — saved and stopping", stop_reason, iter_num
                )
                break
        if pending is not None and not self._stop:
            iter_num = self._finish_step(*pending, iter_num)
        checkpoint.wait_until_finished()
        self.log.info("Training Finished!")
        self.log.close()
        return self.best_performance
