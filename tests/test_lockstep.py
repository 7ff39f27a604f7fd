"""Lockstep COMPOSED-train-step parity against the reference's own code.

`tests/test_reference_parity.py` pins each loss against the reference's
torch modules in isolation; `tests/test_model_parity.py` pins the model
forward. This file pins what neither can: the composed per-iteration
update — loss weighting, NaN-guard placement, clip-before-weight-decay
order, torch-SGD-vs-optax momentum semantics, EMA timing and scope
(params only; teacher norm state advances through its own forward), and
the schedule plumbing (per-epoch beta / FeCL thresholds, per-iter
consistency weight).

Ground truth: the reference's OWN modules — `networks/UNet3D_contrastive
.py` (loaded via a synthetic package so `networks/__init__.py`'s monai
import never runs), `utils/{dycon_losses,losses,ramps}.py` — driven by a
line-faithful transcription of the hot loop at
/root/reference/code/train_DyCON_Pancreas.py:200-272:

    noise = clamp(0.1*randn, ±0.2); ema_inputs = x + noise        (:203-204)
    student fwd / teacher fwd under no_grad                        (:206-208)
    CE + dice on the labeled slice                                 (:216-217)
    embeddings (B,C,N)->transpose->normalize; avg_pool mask        (:219-232)
    FeCL / UnCL / double-softmax MSE consistency                   (:249-255)
    loss = l_w*(ce+dice) + w(t)*cons + u_w*(f+u)                   (:258)
    zero_grad; backward; clip_grad_norm_(1.0);
    SGD(momentum .9, wd 1e-4).step()                               (:265-270)
    update_ema_variables: alpha=min(1-1/(iter+1), .99), params only(:105-109)

run in float64, weight-initialized FROM our params, fed the exact same
batches and the exact same noise our step draws from its PRNG key.

Our side is the REAL production step: `train/step.py::build_train_step`
jitted, f32 — not a re-assembly. The only controlled deviation is
dropout_rate=0 on both sides (dropout masks cannot be equated across
frameworks; everything else, including train-mode BatchNorm batch stats
in the projection head, runs live).

Per-step trajectories compared over 20 iterations (4 epoch boundaries,
so the per-epoch schedules hand over mid-run): all six loss scalars,
the post-update student/teacher global param norms, and the student +
teacher projection-head BN running stats.

Tolerances are calibrated (scripts/exp_lockstep_calibrate.py, CPU,
seed 7): a third arm runs the SAME torch reference loop in float32, so
the framework-intrinsic f32 drift envelope is measured rather than
guessed. Max relative deviation from the f64 ground truth over the 20
steps, ours-f32 vs torch-f32:

    loss      2.6e-3 vs 3.6e-3      u_loss   5.1e-4 vs 1.3e-3
    loss_ce   3.2e-3 vs 1.9e-3      cons     2.7e-2 vs 2.3e-2
    loss_dice 2.4e-3 vs 3.3e-3      pnorm    1.8e-7 vs 8.6e-8
    f_loss    9.2e-3 vs 6.8e-3      bn       5.3e-4 vs 1.6e-4

i.e. our jitted step tracks the f64 trajectory exactly as tightly as
the reference tracks itself in f32 — the deviation is precision, not
semantics. First-step deviations (before any drift amplification) are
<= 4.2e-6 relative on every series and are asserted at 2e-5.
"""

from __future__ import annotations

import copy
import dataclasses
import importlib
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from dycon_paper_replication_tpu.config import make_config
from dycon_paper_replication_tpu.models import net_factory_3d
from dycon_paper_replication_tpu.ops import ramps
from dycon_paper_replication_tpu.train.state import create_train_state, make_optimizer
from dycon_paper_replication_tpu.train.step import (
    SCALAR_METRICS,
    StepScalars,
    build_train_step,
)

REF = "/root/reference/code"

# Small but structurally complete geometry: 4 encoder levels need
# multiples of 16; bottleneck (2,2,1) -> x2 projection grid (4,4,2) ->
# N=32 embeddings; mask kernel feature_scaler*4=8 pools (32,32,16) to
# the same (4,4,2) grid, exactly as at the canonical Pancreas shapes.
PATCH = (32, 32, 16)
BS, LBS = 4, 2
SCALER = 2
N_STEPS = 20
ITERS_PER_EPOCH = 5  # 4 epoch boundaries inside the run


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# Synthetic package: relative imports inside UNet3D_contrastive.py
# (.utils, .networks_other, .assp) resolve against the reference dir
# WITHOUT executing networks/__init__.py (which imports monai).
if "_refnets" not in sys.modules:
    _pkg = types.ModuleType("_refnets")
    _pkg.__path__ = [f"{REF}/networks"]
    sys.modules["_refnets"] = _pkg
ref_net = importlib.import_module("_refnets.UNet3D_contrastive")
ref_dycon = _load("_ref_dycon_lockstep", f"{REF}/utils/dycon_losses.py")
ref_losses = _load("_ref_losses_lockstep", f"{REF}/utils/losses.py")
ref_ramps = _load("_ref_ramps_lockstep", f"{REF}/utils/ramps.py")


# ------------------------------------------------------------------
# weight mapping: our pytree params -> the reference torch module
# ------------------------------------------------------------------


def _copy_conv(tconv, p) -> None:
    # ours DHWIO -> torch (O, I, D, H, W)
    tconv.weight.data = torch.tensor(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2))
    tconv.bias.data = torch.tensor(np.asarray(p["b"]))


def _copy_unetconv3(blk, p) -> None:
    # reference UnetConv3: .conv1/.conv2 = Sequential(Conv3d, InstanceNorm3d,
    # ReLU) (networks/utils.py:99-110); InstanceNorm3d is affine-free
    _copy_conv(blk.conv1[0], p["conv1"])
    _copy_conv(blk.conv2[0], p["conv2"])


def _build_ref_model(params, state) -> torch.nn.Module:
    tm = ref_net.UNet3D(
        in_channels=1, feature_scale=4, n_classes=2, scale_factor=SCALER,
        use_aspp=False,
    )
    for name in ("conv1", "conv2", "conv3", "conv4", "center"):
        _copy_unetconv3(getattr(tm, name), params[name])
    for name in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        _copy_unetconv3(getattr(tm, name).conv, params[name])
    _copy_conv(tm.final, params["final"])
    _copy_conv(tm.out_conv2, params["out_conv2"])
    # projection Sequential: [Conv3d, BN, ReLU, Conv3d, BN]
    # (UNet3D_contrastive.py:261-267)
    _copy_conv(tm.projection[0], params["projection"]["conv1"])
    _copy_conv(tm.projection[3], params["projection"]["conv2"])
    for tbn, pp, ss in (
        (tm.projection[1], params["projection"]["bn1"], state["projection"]["bn1"]),
        (tm.projection[4], params["projection"]["bn2"], state["projection"]["bn2"]),
    ):
        tbn.weight.data = torch.tensor(np.asarray(pp["scale"]))
        tbn.bias.data = torch.tensor(np.asarray(pp["bias"]))
        tbn.running_mean.data = torch.tensor(np.asarray(ss["mean"]))
        tbn.running_var.data = torch.tensor(np.asarray(ss["var"]))
    # controlled deviation: dropout masks cannot be matched across
    # frameworks — rate 0 on BOTH sides (see module docstring)
    tm.dropout1.p = 0.0
    tm.dropout2.p = 0.0
    return tm


def _global_norm_torch(tensors) -> float:
    return float(torch.sqrt(sum(t.detach().double().pow(2).sum() for t in tensors)))


def _global_norm_tree(tree) -> float:
    leaves = jax.tree.leaves(tree)
    return float(np.sqrt(sum(float(np.sum(np.square(np.asarray(l, np.float64)))) for l in leaves)))


# ------------------------------------------------------------------
# fixtures: deterministic batches + the exact noise our step will draw
# ------------------------------------------------------------------


def _make_batches():
    rng = np.random.default_rng(42)
    images, labels = [], []
    for _ in range(N_STEPS):
        img = rng.normal(size=(BS,) + PATCH + (1,)).astype(np.float32)
        lab = np.zeros((BS,) + PATCH, np.int32)
        for b in range(BS):
            # random cuboid foreground: pooled (>0.5) mask gets a
            # nontrivial positive/negative split in every sample
            o = rng.integers(0, 8, 3)
            e = [o[i] + rng.integers(8, PATCH[i] - 7) for i in range(3)]
            lab[b, o[0]:e[0], o[1]:e[1], o[2]:e[2]] = 1
        images.append(img)
        labels.append(lab)
    return images, labels


def _schedules(it: int):
    """Per-step scalars exactly as Trainer computes them (trainer.py:
    270-282) == the reference's (train_DyCON_Pancreas.py:195-198,101-103)."""
    cfg = _cfg()
    epoch = it // ITERS_PER_EPOCH
    max_epoch = N_STEPS // ITERS_PER_EPOCH + 1
    beta = ramps.adaptive_beta(epoch, max_epoch, cfg.beta_max, cfg.beta_min)
    pos_th = ramps.threshold_rampup(epoch, cfg.fecl_rampup_epochs, 1.3, 1.5)
    neg_th = ramps.threshold_rampup(epoch, cfg.fecl_rampup_epochs, 0.3, 0.5)
    w = cfg.consistency * ramps.sigmoid_rampup(it // 150, cfg.consistency_rampup)
    return epoch, beta, pos_th, neg_th, w


def _cfg():
    return make_config(
        "pancreas",
        patch_size=PATCH, batch_size=BS, labeled_bs=LBS,
        max_iterations=N_STEPS, seed=7,
        layout="NDHWC", compute_dtype="float32", remat="none", fecl_chunk=0,
    )


# ------------------------------------------------------------------
# the two trajectories
# ------------------------------------------------------------------


def _our_trajectory(images, labels):
    cfg = _cfg()
    model = net_factory_3d(
        "unet_3D", in_chns=1, class_num=2, scaler=SCALER,
        compute_dtype=jnp.float32, layout="NDHWC",
    )
    model.cfg = dataclasses.replace(model.cfg, dropout_rate=0.0)
    optimizer = make_optimizer(
        lambda s: cfg.base_lr, cfg.momentum, cfg.weight_decay, cfg.grad_clip_norm
    )
    state = create_train_state(model, jax.random.key(cfg.seed), optimizer)
    params0 = jax.tree.map(np.asarray, state.params)
    state0 = jax.tree.map(np.asarray, state.model_state)

    step_fn = jax.jit(build_train_step(model, optimizer, cfg))
    key = jax.random.key(cfg.seed + 1)  # trainer.py:304
    noises, recs = [], []
    for it in range(N_STEPS):
        _, beta, pos_th, neg_th, w = _schedules(it)
        key, step_key = jax.random.split(key)
        # replicate the step's internal noise draw (step.py:181-186) so
        # the torch ground truth sees the identical teacher input
        noise_key = jax.random.split(step_key, 3)[0]
        noise = np.asarray(
            jnp.clip(
                0.1 * jax.random.normal(noise_key, images[it].shape, jnp.float32),
                -0.2, 0.2,
            )
        )
        noises.append(noise)
        batch = {"image": jnp.asarray(images[it]), "label": jnp.asarray(labels[it])}
        state, m = step_fn(state, batch, step_key, StepScalars.make(beta, w, pos_th, neg_th))
        v = dict(zip(SCALAR_METRICS, np.asarray(m["scalars"]).tolist()))
        assert v["skipped"] == 0.0
        recs.append(
            dict(
                loss=v["loss"], loss_ce=v["loss_ce"], loss_dice=v["loss_dice"],
                f_loss=v["f_loss"], u_loss=v["u_loss"], cons=v["consistency_loss"],
                pnorm=_global_norm_tree(state.params),
                tnorm=_global_norm_tree(state.teacher_params),
                bn=_bn_summary_tree(state.model_state),
                tbn=_bn_summary_tree(state.teacher_state),
            )
        )
    return params0, state0, noises, recs


def _bn_summary_tree(mstate) -> float:
    p = mstate["projection"]
    return float(
        np.sum(np.abs(np.asarray(p["bn1"]["mean"], np.float64)))
        + np.sum(np.abs(np.asarray(p["bn2"]["mean"], np.float64)))
        + np.sum(np.asarray(p["bn1"]["var"], np.float64))
        + np.sum(np.asarray(p["bn2"]["var"], np.float64))
    )


def _bn_summary_torch(tm) -> float:
    return float(
        tm.projection[1].running_mean.double().abs().sum()
        + tm.projection[4].running_mean.double().abs().sum()
        + tm.projection[1].running_var.double().sum()
        + tm.projection[4].running_var.double().sum()
    )


def _torch_trajectory(params0, state0, images, labels, noises, dtype=torch.float64):
    cfg = _cfg()
    model = _build_ref_model(params0, state0).to(dtype).train()
    # teacher: deepcopy + detach (train_DyCON_Pancreas.py:141-142);
    # stays in train mode like the reference (ema_model.train(), :170)
    ema_model = copy.deepcopy(model)
    for p in ema_model.parameters():
        p.detach_()
    optimizer = torch.optim.SGD(
        model.parameters(), lr=cfg.base_lr, momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
    )
    fecl = ref_dycon.FeCLoss(
        device="cpu", temperature=cfg.temp, gamma=cfg.gamma,
        use_focal=bool(cfg.use_focal), rampup_epochs=1500,  # :188-189
    )
    uncl = ref_dycon.UnCLoss()
    max_epoch = N_STEPS // ITERS_PER_EPOCH + 1
    iter_num = 0
    recs = []
    for it in range(N_STEPS):
        epoch_num = it // ITERS_PER_EPOCH
        beta = ref_dycon.adaptive_beta(
            epoch=epoch_num, total_epochs=max_epoch,
            max_beta=cfg.beta_max, min_beta=cfg.beta_min,
        )
        volume_batch = torch.tensor(np.moveaxis(images[it], -1, 1), dtype=dtype)
        label_batch = torch.tensor(labels[it]).long()
        noise = torch.tensor(np.moveaxis(noises[it], -1, 1), dtype=dtype)
        ema_inputs = volume_batch + noise

        _, stud_logits, stud_features = model(volume_batch)
        with torch.no_grad():
            _, ema_logits, ema_features = ema_model(ema_inputs)

        stud_probs = TF.softmax(stud_logits, dim=1)
        ema_probs = TF.softmax(ema_logits, dim=1)
        consistency_weight = cfg.consistency * ref_ramps.sigmoid_rampup(
            iter_num // 150, cfg.consistency_rampup
        )
        loss_seg = TF.cross_entropy(stud_logits[:LBS], label_batch[:LBS])
        loss_seg_dice = ref_losses.dice_loss(
            stud_probs[:LBS, 1], label_batch[:LBS] == 1
        )
        B, C = stud_features.shape[:2]
        stud_embedding = TF.normalize(
            stud_features.view(B, C, -1).transpose(1, 2), dim=-1
        )
        ema_embedding = TF.normalize(
            ema_features.view(B, C, -1).transpose(1, 2), dim=-1
        )
        mask_con = TF.avg_pool3d(
            label_batch.to(dtype), kernel_size=SCALER * 4, stride=SCALER * 4
        )
        mask_con = (mask_con > 0.5).to(dtype).reshape(B, -1).unsqueeze(1)
        teacher_feat = ema_embedding if cfg.use_teacher_loss else None
        f_loss = fecl(
            feat=stud_embedding, mask=mask_con, teacher_feat=teacher_feat,
            gambling_uncertainty=None, epoch=epoch_num,
        )
        u_loss = uncl(stud_logits, ema_logits, beta)
        consistency_loss = ref_losses.softmax_mse_loss(
            stud_probs[LBS:], ema_probs[LBS:]
        ).mean()
        loss = (
            cfg.l_weight * (loss_seg + loss_seg_dice)
            + consistency_weight * consistency_loss
            + cfg.u_weight * (f_loss + u_loss)
        )
        assert torch.isfinite(loss)
        optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=1.0)
        optimizer.step()
        # update_ema_variables (train_DyCON_Pancreas.py:105-109,272):
        # params only — BN buffers advance through the teacher forward
        alpha = min(1 - 1 / (iter_num + 1), cfg.ema_decay)
        with torch.no_grad():
            for ep, p in zip(ema_model.parameters(), model.parameters()):
                ep.data.mul_(alpha).add_(p.data, alpha=1 - alpha)
        iter_num += 1
        recs.append(
            dict(
                loss=float(loss.detach()), loss_ce=float(loss_seg.detach()),
                loss_dice=float(loss_seg_dice.detach()),
                f_loss=float(f_loss.detach()), u_loss=float(u_loss.detach()),
                cons=float(consistency_loss.detach()),
                pnorm=_global_norm_torch(model.parameters()),
                tnorm=_global_norm_torch(ema_model.parameters()),
                bn=_bn_summary_torch(model),
                tbn=_bn_summary_torch(ema_model),
            )
        )
    return recs


# ------------------------------------------------------------------


KEYS = ("loss", "loss_ce", "loss_dice", "f_loss", "u_loss", "cons",
        "pnorm", "tnorm", "bn", "tbn")
# Full-trajectory tolerances: ~4x the MEASURED torch-f32-vs-f64 drift
# envelope (module docstring / scripts/exp_lockstep_calibrate.py) — a
# semantic error (wrong weighting, wrong clip order, wrong EMA scope)
# shifts these series by orders of magnitude more than precision drift.
RTOL = dict(loss=2e-2, loss_ce=2e-2, loss_dice=2e-2, f_loss=4e-2,
            u_loss=1e-2, cons=1e-1,
            pnorm=1e-6, tnorm=1e-6, bn=3e-3, tbn=2e-3)
ATOL = {k: 1e-7 for k in KEYS}
# First-step tolerance: no drift amplification yet — measured <= 4.2e-6.
FIRST_RTOL = 2e-5


@pytest.mark.slow
def test_composed_train_step_matches_reference_trajectory():
    images, labels = _make_batches()
    params0, state0, noises, ours = _our_trajectory(images, labels)
    refs = _torch_trajectory(params0, state0, images, labels, noises)
    worst = {}
    for k in KEYS:
        o = np.array([r[k] for r in ours])
        r = np.array([r[k] for r in refs])
        dev = np.abs(o - r) / (np.abs(r) + ATOL[k])
        worst[k] = float(dev.max())
        assert dev[0] <= FIRST_RTOL, (
            f"{k} step-1 deviation {dev[0]:.2e} (ours={o[0]} ref={r[0]}): "
            "the composed step disagrees BEFORE drift can amplify — "
            "semantic mismatch, not precision"
        )
        np.testing.assert_allclose(
            o, r, rtol=RTOL[k], atol=ATOL[k],
            err_msg=f"{k}: ours={o.tolist()} ref={r.tolist()}",
        )
    # keep the measured drift visible in -s output for future tightening
    print("lockstep max rel deviations:", {k: f"{v:.2e}" for k, v in worst.items()})
