"""The DyCON train step: one jitted, donate-friendly program.

Everything the reference does per iteration on the host+GPU boundary
(train_DyCON_Pancreas.py:200-295) happens here in a single XLA program:

  noise injection -> student fwd -> teacher fwd -> CE + Dice (labeled
  slice) -> FeCL (embeddings + pooled mask) -> UnCL -> consistency
  (unlabeled slice) -> weighted sum -> grad -> global-norm clip ->
  SGD+momentum -> EMA teacher update -> NaN/Inf skip -> on-device Dice.

Per-epoch / per-iteration scalars (beta, consistency weight, FeCL focal
thresholds, EMA alpha pieces) enter as a small f32 array operand, so the
step never recompiles across epochs. The labeled/unlabeled split relies
on the two-stream batch layout (labeled samples occupy batch[:labeled_bs],
dataloaders' sampler contract).

Batch layout: image (B, D1, D2, D3, C) f32, label (B, D1, D2, D3) i32.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..ops import dycon, losses
from ..ops.bits import packbits_le as _packbits
from ..ops.fecl_fused import fecl_loss_fused
from ..ops.resize import avg_pool_nonoverlap
from .state import TrainState, ema_update


class StepScalars(NamedTuple):
    """Dynamic per-step scalars (all f32 device scalars)."""

    beta: jnp.ndarray
    consistency_weight: jnp.ndarray
    pos_thresh: jnp.ndarray
    neg_thresh: jnp.ndarray

    @staticmethod
    def make(beta: float, consistency_weight: float, pos_thresh: float, neg_thresh: float):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return StepScalars(f(beta), f(consistency_weight), f(pos_thresh), f(neg_thresh))


def _normalized_embeddings(features: jnp.ndarray) -> jnp.ndarray:
    """(B, d1, d2, d3, C) projection map -> (B, N, C) L2-normalized rows.

    N iterates over spatial locations. The reference flattens the
    channels-first map as (B, C, N) then transposes; our channels-last
    reshape lands on the same (location, channel) pairs in a different N
    order — loss values are permutation-invariant in N.
    """
    b = features.shape[0]
    c = features.shape[-1]
    flat = features.reshape(b, -1, c)
    norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
    return flat / jnp.maximum(norm, 1e-12)


def _mask_kernel(cfg: TrainConfig, image_spatial, feat_spatial) -> tuple[int, int, int]:
    """Contrastive-mask pool kernel: fixed feature_scaler*4 (BraTS/Pancreas,
    train_DyCON_Pancreas.py:229) or derived per-axis from runtime shapes
    (ISLES, train_DyCON_ISLES22.py:270-276). Shapes are static under jit."""
    if cfg.mask_kernel_mode == "fixed":
        k = cfg.feature_scaler * 4
        return (k, k, k)
    return tuple(i // f for i, f in zip(image_spatial, feat_spatial))


def build_train_step(model, optimizer, cfg: TrainConfig, *, diagnostics: bool = True) -> Callable:
    """Returns train_step(state, batch, rng, scalars) -> (state, metrics).

    diagnostics=False builds the LIGHT variant: metrics carry only the
    packed per-step scalar vector, omitting the cadence-gated outputs
    (`pred_fg_bits` for train-HD95, `embedding`/`mask_con` for the
    similarity monitor). Those are only consumed every hd95_every / 200
    iterations (trainer.py), yet as program outputs they must be
    materialized into HBM every step and inhibit fusion of the layers
    that produce them; the trainer compiles both variants and dispatches
    the full one only on iterations whose outputs will be read."""

    labeled_bs = cfg.labeled_bs
    consistency_kind = cfg.consistency_type

    def _student_forward(params, model_state, image, rng):
        return model.apply(params, model_state, image, train=True, rng=rng)

    if cfg.remat == "full":
        # recompute the student forward in the backward pass instead of
        # storing every activation — the 8x lane-padded f32 residuals of
        # big-patch configs exceed 16GB HBM otherwise
        _student_forward = jax.checkpoint(_student_forward)

    def loss_fn(params, model_state, batch, teacher_out, rng, scalars: StepScalars):
        image, label = batch["image"], batch["label"]
        (t_sdf, t_logits, t_features) = teacher_out

        (_, s_logits, s_features), new_model_state = _student_forward(
            params, model_state, image, rng
        )

        s_probs = jax.nn.softmax(s_logits, axis=-1)
        t_probs = jax.nn.softmax(t_logits, axis=-1)

        # --- supervised (labeled slice) ---
        loss_ce = losses.cross_entropy_loss(s_logits[:labeled_bs], label[:labeled_bs])
        if cfg.dice_loss_kind == "binary":
            loss_dice = losses.dice_loss(
                s_probs[:labeled_bs, ..., 1], label[:labeled_bs] == 1
            )
        else:
            loss_dice = losses.dice_loss_nclass(
                s_probs[:labeled_bs], label[:labeled_bs], cfg.num_classes
            )

        # --- FeCL over projection embeddings ---
        stud_emb = _normalized_embeddings(s_features)
        ema_emb = _normalized_embeddings(t_features)
        kernel = _mask_kernel(cfg, image.shape[1:4], s_features.shape[1:4])
        mask = avg_pool_nonoverlap(label.astype(jnp.float32), kernel)
        mask = (mask > 0.5).astype(jnp.float32).reshape(label.shape[0], -1)
        fecl_kwargs = dict(
            temperature=cfg.temp,
            gamma=cfg.gamma,
            use_focal=bool(cfg.use_focal),
            pos_thresh=scalars.pos_thresh,
            neg_thresh=scalars.neg_thresh,
        )
        teacher_emb = jax.lax.stop_gradient(ema_emb) if cfg.use_teacher_loss else None
        if cfg.fecl_chunk > 0:
            if cfg.fecl_impl == "fused":
                # analytic custom-VJP backward: one tile pass instead of
                # jax.checkpoint's full forward recompute. Valid here
                # because teacher_emb is stop-gradient'ed and mask is
                # binary (both required by fecl_loss_fused).
                f_loss = fecl_loss_fused(
                    stud_emb, mask, teacher_emb, row_chunk=cfg.fecl_chunk, **fecl_kwargs
                )
            else:
                f_loss = dycon.fecl_loss_chunked(
                    stud_emb, mask, teacher_emb, row_chunk=cfg.fecl_chunk, **fecl_kwargs
                )
        else:
            f_loss = dycon.fecl_loss(stud_emb, mask, teacher_emb, **fecl_kwargs)

        # --- UnCL + plain consistency ---
        u_loss = dycon.uncl_loss(s_logits, jax.lax.stop_gradient(t_logits), scalars.beta)
        # Faithfulness quirk: the reference feeds ALREADY-SOFTMAXED probs
        # into softmax_mse_loss / softmax_kl_loss, which softmax them a
        # second time (train_DyCON_Pancreas.py:255 + utils/losses.py:65-104).
        # The double softmax flattens the distributions and shrinks the
        # term ~5x vs plain MSE-on-probs — keep it, it defines training.
        if consistency_kind == "mse":
            cons = jnp.mean(
                losses.softmax_mse_loss(s_probs[labeled_bs:], t_probs[labeled_bs:])
            )
        else:
            cons = losses.softmax_kl_loss(s_probs[labeled_bs:], t_probs[labeled_bs:])

        total = (
            cfg.l_weight * (loss_ce + loss_dice)
            + scalars.consistency_weight * cons
            + cfg.u_weight * (f_loss + u_loss)
        )
        aux = {
            "loss": total,
            "loss_ce": loss_ce,
            "loss_dice": loss_dice,
            "f_loss": f_loss,
            "u_loss": u_loss,
            "consistency_loss": cons,
            "new_model_state": new_model_state,
            "s_probs": s_probs,
            "embedding": stud_emb,
            "mask_con": mask,
        }
        return total, aux

    def train_step(state: TrainState, batch, rng: jax.Array, scalars: StepScalars):
        # widen wire dtypes once: the loader may ship f16 images / u8
        # labels to halve H2D bytes (cfg.wire_dtype); everything below
        # sees f32/i32 exactly as with full-width transfers
        batch = {
            "image": batch["image"].astype(jnp.float32),
            "label": batch["label"].astype(jnp.int32),
        }
        noise_key, student_key, teacher_key = jax.random.split(rng, 3)
        image = batch["image"]

        noise = jnp.clip(
            0.1 * jax.random.normal(noise_key, image.shape, image.dtype), -0.2, 0.2
        )
        teacher_in = image + noise
        teacher_out, new_teacher_state = model.apply(
            state.teacher_params,
            state.teacher_state,
            teacher_in,
            train=cfg.teacher_train_mode,
            rng=teacher_key if cfg.teacher_train_mode else None,
        )
        teacher_out = jax.lax.stop_gradient(teacher_out)

        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, state.model_state, batch, teacher_out, student_key, scalars
        )
        total = aux["loss"]

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        # EMA with warmup: alpha = min(1 - 1/(step+1), decay), step pre-increment
        alpha = jnp.minimum(
            1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0), cfg.ema_decay
        )
        new_teacher_params = ema_update(state.teacher_params, new_params, alpha)

        # NaN/Inf guard: drop the whole update (params, momentum, teacher EMA,
        # step count) exactly like the reference's `continue`; the teacher's
        # norm state still advances (its forward already ran).
        bad = jnp.isnan(total) | jnp.isinf(total)

        def pick(new, old):
            return jax.tree.map(lambda n, o: jnp.where(bad, o, n), new, old)

        new_state = TrainState(
            step=jnp.where(bad, state.step, state.step + 1),
            params=pick(new_params, state.params),
            model_state=pick(aux["new_model_state"], state.model_state),
            teacher_params=pick(new_teacher_params, state.teacher_params),
            teacher_state=new_teacher_state,
            opt_state=pick(new_opt_state, state.opt_state),
        )

        # On-device train metrics (reference computes these on host per iter)
        pred_fg = (aux["s_probs"][..., 1] > 0.5).astype(jnp.float32)
        lab_f = batch["label"].astype(jnp.float32)
        inter = jnp.sum(pred_fg * lab_f, axis=(1, 2, 3))
        dice_b = (2.0 * inter) / (
            jnp.sum(pred_fg, axis=(1, 2, 3)) + jnp.sum(lab_f, axis=(1, 2, 3)) + 1e-8
        )
        scalar_vec = jnp.stack(
            [
                total,
                aux["loss_ce"],
                aux["loss_dice"],
                aux["f_loss"],
                aux["u_loss"],
                aux["consistency_loss"],
                jnp.mean(dice_b),
                bad.astype(jnp.float32),
            ]
        )
        metrics = {
            # all per-step scalars in ONE array: the host fetches them with
            # a single D2H (high-latency links make per-scalar fetches the
            # hot-loop bottleneck); order = SCALAR_METRICS
            "scalars": scalar_vec,
        }
        if diagnostics:
            metrics.update({
                # bit-packed wire: the host only needs the binary mask for
                # HD95 — 32x fewer D2H bytes than f32 over the slow relay
                # link (unpack with np.unpackbits(..., axis=-1,
                # bitorder="little"); last axis padded to a byte multiple)
                "pred_fg_bits": _packbits(pred_fg),
                # device-resident diagnostics; transferred only when consumed
                "embedding": jax.lax.stop_gradient(aux["embedding"]),
                "mask_con": aux["mask_con"],
            })
        return new_state, metrics

    return train_step




# order of the packed per-step scalar metrics returned by train_step
SCALAR_METRICS = (
    "loss",
    "loss_ce",
    "loss_dice",
    "f_loss",
    "u_loss",
    "consistency_loss",
    "train_dice",
    "skipped",
)


def unpack_scalars(metrics) -> dict[str, float]:
    """metrics['scalars'] device vector -> {name: float} (one D2H)."""
    import numpy as np

    return dict(zip(SCALAR_METRICS, np.asarray(metrics["scalars"]).tolist()))
