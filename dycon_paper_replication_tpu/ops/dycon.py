"""DyCON's two signature losses as pure jnp functions.

* UnCL — uncertainty-aware consistency between student and teacher
  voxel class distributions, weighted by the exponentiated Shannon
  entropies of both predictions.
* FeCL — voxel-level focal InfoNCE over projection-head embeddings with
  an auxiliary teacher cross-negative branch.

Behavioral parity targets (reference, for auditing only — re-derived
from the published math, not translated):
  /root/reference/code/utils/dycon_losses.py:94-118  (UnCLoss)
  /root/reference/code/utils/dycon_losses.py:150-235 (FeCLoss)

Faithfulness notes (quirks that define the trained behavior, kept
deliberately — see SURVEY.md §7 "faithfulness ledger"):
  * UnCL's entropy penalty: the reference adds a (B,1,...) entropy map to
    a (B,...) summed-difference map, which broadcasts to (B,B,...) before
    the mean. Because mean(x_i + y_j over i,j) == mean(x) + mean(y), the
    value equals mean(weighted diff) + beta * mean(H_s + H_t); we compute
    that directly.
  * FeCL's positive focal threshold ramps over 1.3..1.5 while the
    similarity proxy `division` lies in (0, 1], so ALL positive pairs are
    focal-reweighted by (1 - division)^gamma. Do not "fix".
  * FeCL's row-max subtraction uses the max over axis -2 (per-column max
    across rows), after the diagonal has been zeroed.
  * The teacher cross-similarity is raw (un-tempered) cosine similarity.

Focal thresholds are epoch-dependent Python floats computed on the host
(`ops.ramps.threshold_rampup`) and passed in as scalar operands so the
jitted step never recompiles across epochs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_ENTROPY = 1e-6
_EPS_LOG = 1e-18


def uncl_loss(
    s_logits: jnp.ndarray, t_logits: jnp.ndarray, beta: jnp.ndarray | float
) -> jnp.ndarray:
    """Uncertainty-aware consistency loss (UnCL).

    s_logits, t_logits: (B, D1, D2, D3, C) channels-last logits.
    beta: scalar entropy-weighting coefficient.

    value = mean_vox[ sum_c (p_s - p_t)^2 / (e^{beta*H_s} + e^{beta*H_t}) ]
            + beta * mean_vox[ H_s + H_t ]
    where H = -sum_c p log(p + 1e-6) is the per-voxel Shannon entropy.
    """
    p_s = jax.nn.softmax(s_logits, axis=-1)
    p_t = jax.nn.softmax(t_logits, axis=-1)
    h_s = -jnp.sum(p_s * jnp.log(p_s + _EPS_ENTROPY), axis=-1)  # (B, D1, D2, D3)
    h_t = -jnp.sum(p_t * jnp.log(p_t + _EPS_ENTROPY), axis=-1)
    weight = jnp.exp(beta * h_s) + jnp.exp(beta * h_t)
    diff = jnp.sum((p_s - p_t) ** 2, axis=-1)  # (B, D1, D2, D3)
    return jnp.mean(diff / weight) + beta * jnp.mean(h_s + h_t)


def fecl_loss(
    feat: jnp.ndarray,
    mask: jnp.ndarray,
    teacher_feat: jnp.ndarray | None = None,
    gambling_uncertainty: jnp.ndarray | None = None,
    *,
    temperature: float = 0.6,
    gamma: float = 2.0,
    use_focal: bool = True,
    pos_thresh: jnp.ndarray | float = 1.5,
    neg_thresh: jnp.ndarray | float = 0.5,
    lambda_cross: float = 1.0,
) -> jnp.ndarray:
    """Focal voxel contrastive loss (FeCL) + teacher cross-negative branch.

    feat:         (B, N, D) L2-normalized student embeddings.
    mask:         (B, N) binary class id per embedding location.
    teacher_feat: optional (B, N, D) L2-normalized teacher embeddings.
    gambling_uncertainty: optional (B, N) per-location weight on the
        positive term (reference defines it but always passes None).
    pos_thresh / neg_thresh: focal hard-pair thresholds for this epoch.

    Returns a scalar: student InfoNCE (optionally focal-weighted)
    + lambda_cross * teacher hard-negative penalty.
    """
    B, N, _ = feat.shape
    dtype = feat.dtype

    same = (mask[:, :, None] == mask[:, None, :]).astype(dtype)  # (B, N, N)
    diff = 1.0 - same
    eye = jnp.eye(N, dtype=dtype)
    off_diag = 1.0 - eye

    logits = (
        jnp.einsum("bnd,bmd->bnm", feat, feat, preferred_element_type=jnp.float32)
        / temperature
    )
    logits = logits * off_diag  # zero self-similarity BEFORE the max-shift
    col_max = jax.lax.stop_gradient(jnp.max(logits, axis=-2, keepdims=True))  # (B,1,N)
    exp_logits = jnp.exp(logits - col_max)

    neg_sum = jnp.sum(exp_logits * diff, axis=-1, keepdims=True)  # (B, N, 1)
    division = exp_logits / (exp_logits + neg_sum + _EPS_LOG)  # (B, N, N) in (0, 1]

    loss_matrix = -jnp.log(division + _EPS_LOG) * same * off_diag
    # rows with no positive pair contribute 0 (the reference divides a
    # zero row-sum by 1e-18; XLA constant-folds `- 1.0 + 1e-18` into
    # `- 1.0` under jit, turning that into 0/0 NaN, so guard explicitly)
    pos_count = jnp.sum(same, axis=-1) - 1.0  # (B, N)
    has_pos = pos_count > 0

    def _row_mean(row_sums):
        return jnp.mean(
            jnp.where(has_pos, row_sums / jnp.maximum(pos_count, 1.0), 0.0)
        )

    if use_focal:
        sim = division
        hard_pos = (same > 0) & (sim < pos_thresh)
        hard_neg = (diff > 0) & (sim > neg_thresh)
        focal = jnp.where(
            hard_pos,
            (1.0 - sim) ** gamma,
            jnp.where(hard_neg, sim**gamma, jnp.ones_like(sim)),
        )
        loss_student = _row_mean(jnp.sum(loss_matrix * focal, axis=-1))
    else:
        loss_student = _row_mean(jnp.sum(loss_matrix, axis=-1))

    if gambling_uncertainty is not None:
        per_patch = jnp.where(
            has_pos, jnp.sum(loss_matrix, axis=-1) / jnp.maximum(pos_count, 1.0), 0.0
        )  # (B, N)
        loss_student = jnp.mean(per_patch * gambling_uncertainty)

    if teacher_feat is None:
        return loss_student

    # Teacher cross-negative branch: penalize unlabeled-vs-teacher pairs of
    # DIFFERENT class whose raw cosine similarity exceeds the ramped
    # threshold: -log(1 - sim). When no pair qualifies the term is 0.
    cross_sim = jnp.einsum(
        "bnd,bmd->bnm", feat, teacher_feat, preferred_element_type=jnp.float32
    )
    cross_hard = ((diff > 0) & (cross_sim > neg_thresh)).astype(dtype)
    # f32 cosine similarity of near-identical embeddings can round above
    # 1, where the reference's -log(1-sim) yields NaN and its host guard
    # drops the whole step; clamp at 0 so the term spikes (to -log(eps))
    # instead of destroying the update
    cross_term = -jnp.log(jnp.maximum(1.0 - cross_sim, 0.0) + _EPS_LOG) * cross_hard
    loss_cross = jnp.sum(cross_term) / (jnp.sum(cross_hard) + _EPS_LOG)

    return loss_student + lambda_cross * loss_cross


def gambling_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the class axis with an epsilon-guarded denominator."""
    e = jnp.exp(logits)
    return e / (jnp.sum(e, axis=-1, keepdims=True) + _EPS_LOG)


def fecl_loss_chunked(
    feat: jnp.ndarray,
    mask: jnp.ndarray,
    teacher_feat: jnp.ndarray | None = None,
    gambling_uncertainty: jnp.ndarray | None = None,
    *,
    temperature: float = 0.6,
    gamma: float = 2.0,
    use_focal: bool = True,
    pos_thresh: jnp.ndarray | float = 1.5,
    neg_thresh: jnp.ndarray | float = 0.5,
    lambda_cross: float = 1.0,
    row_chunk: int = 512,
) -> jnp.ndarray:
    """FeCL with flash-attention-style row chunking.

    Numerically identical math to `fecl_loss`, but the (B, N, N)
    similarity / division / focal matrices are never materialized in
    HBM: rows are processed in `row_chunk`-sized tiles inside a
    rematerialized `lax.scan`, so peak memory is O(B * row_chunk * N)
    and the backward pass recomputes tiles instead of storing them.
    Use for large N (ISLES: N = 9216 -> dense needs ~170M-element
    matrices; see SURVEY.md §3.2). When N is not divisible by row_chunk
    the row axis is padded with masked-out rows (sentinel class -1,
    zero embeddings) so the chunked memory guarantee holds for any N:
    validity masks keep the pad out of every positive/negative set and
    the student mean divides by the true N (VERDICT r4 #7 — the old
    dense fallback traded the caller's memory bound for an OOM).
    """
    B, n_true, D = feat.shape
    if n_true % row_chunk:
        pad = row_chunk - n_true % row_chunk
        feat = jnp.pad(feat, ((0, 0), (0, pad), (0, 0)))
        # f32 sentinel: a bool/uint8 mask would wrap -1 onto a real class
        mask = jnp.concatenate(
            [mask.astype(jnp.float32), jnp.full((B, pad), -1.0, jnp.float32)], axis=1
        )
        if teacher_feat is not None:
            teacher_feat = jnp.pad(teacher_feat, ((0, 0), (0, pad), (0, 0)))
        if gambling_uncertainty is not None:
            gambling_uncertainty = jnp.pad(gambling_uncertainty, ((0, 0), (0, pad)))
    N = feat.shape[1]
    padded = N != n_true
    T = row_chunk
    n_tiles = N // T
    dtype = feat.dtype

    def per_item(feat_b, mask_b, tfeat_b=None, gamb_b=None):
        row_ids = jnp.arange(N)
        # 1 for true rows/columns, 0 for row_chunk-alignment padding
        col_valid = (row_ids < n_true).astype(dtype)
        feat_tiles = feat_b.reshape(n_tiles, T, D)
        id_tiles = row_ids.reshape(n_tiles, T)
        mask_tiles = mask_b.reshape(n_tiles, T)
        gamb_tiles = None if gamb_b is None else gamb_b.reshape(n_tiles, T)

        # ---- pass 1: per-column max of the diag-zeroed logits ----
        def colmax_body(carry, xs):
            f_t, ids = xs
            l_t = (
                jnp.einsum("td,nd->tn", f_t, feat_b, preferred_element_type=jnp.float32)
                / temperature
            )
            l_t = l_t * (ids[:, None] != row_ids[None, :]).astype(l_t.dtype)
            return jnp.maximum(carry, jnp.max(l_t, axis=0)), None

        col_max, _ = jax.lax.scan(
            colmax_body, jnp.full((N,), -jnp.inf, jnp.float32), (feat_tiles, id_tiles)
        )
        col_max = jax.lax.stop_gradient(col_max)

        # ---- pass 2: per-row-tile loss terms ----
        @jax.checkpoint
        def tile_terms(f_t, ids, m_t, g_t):
            same = (m_t[:, None] == mask_b[None, :]).astype(dtype)  # (T, N)
            diff = 1.0 - same
            if padded:
                # pad columns: the -1 sentinel already keeps them out of
                # `same` for real rows; exclude them from the negative
                # set too (their exp(0 - col_max) would pollute neg_sum)
                diff = diff * col_valid[None, :]
            off_diag = (ids[:, None] != row_ids[None, :]).astype(dtype)
            l_t = (
                jnp.einsum("td,nd->tn", f_t, feat_b, preferred_element_type=jnp.float32)
                / temperature
            )
            l_t = l_t * off_diag
            e_t = jnp.exp(l_t - col_max[None, :])
            neg_sum = jnp.sum(e_t * diff, axis=-1, keepdims=True)
            division = e_t / (e_t + neg_sum + _EPS_LOG)
            loss_mat = -jnp.log(division + _EPS_LOG) * same * off_diag
            pos_count = jnp.sum(same, axis=-1) - 1.0
            if use_focal and g_t is None:
                hard_pos = (same > 0) & (division < pos_thresh)
                hard_neg = (diff > 0) & (division > neg_thresh)
                focal = jnp.where(
                    hard_pos,
                    (1.0 - division) ** gamma,
                    jnp.where(hard_neg, division**gamma, jnp.ones_like(division)),
                )
                row_sum = jnp.sum(loss_mat * focal, axis=-1)
            else:
                row_sum = jnp.sum(loss_mat, axis=-1)
            row_mean = jnp.where(
                pos_count > 0, row_sum / jnp.maximum(pos_count, 1.0), 0.0
            )
            if padded:
                # pad rows form sentinel-class "positives" among
                # themselves — zero their row means outright
                row_mean = row_mean * (ids < n_true).astype(row_mean.dtype)
            if g_t is not None:
                # gambling weighting replaces the focal/unfocal student
                # term with gambling-weighted UNFOCAL row means, exactly
                # as the dense path (and the reference, which discards
                # the focal loss when gambling weights are given,
                # dycon_losses.py:204-208)
                row_mean = row_mean * g_t
            student = jnp.sum(row_mean)
            if tfeat_b is None:
                return student, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)
            cs = jnp.einsum("td,nd->tn", f_t, tfeat_b, preferred_element_type=jnp.float32)
            hard = (diff > 0) & (cs > neg_thresh)
            if padded:
                # diff already excludes pad columns; exclude pad rows too
                hard = hard & (ids[:, None] < n_true)
            hard = hard.astype(dtype)
            cross_sum = jnp.sum(-jnp.log(jnp.maximum(1.0 - cs, 0.0) + _EPS_LOG) * hard)
            return student, cross_sum, jnp.sum(hard)

        def scan_body(carry, xs):
            s, cs, cc = tile_terms(xs["f"], xs["ids"], xs["m"], xs.get("g"))
            return (carry[0] + s, carry[1] + cs, carry[2] + cc), None

        xs = {"f": feat_tiles, "ids": id_tiles, "m": mask_tiles}
        if gamb_tiles is not None:
            xs["g"] = gamb_tiles
        (student_sum, cross_sum, cross_cnt), _ = jax.lax.scan(
            scan_body, (jnp.zeros((), jnp.float32),) * 3, xs
        )
        return student_sum, cross_sum, cross_cnt

    # vmap over a dict pytree so the optional teacher / gambling operands
    # map only when present (None stays a static Python branch)
    mapped = {"f": feat, "m": mask}
    if teacher_feat is not None:
        mapped["t"] = teacher_feat
    if gambling_uncertainty is not None:
        mapped["g"] = gambling_uncertainty
    s, cs, cc = jax.vmap(
        lambda d: per_item(d["f"], d["m"], d.get("t"), d.get("g"))
    )(mapped)

    loss_student = jnp.sum(s) / (B * n_true)  # mean over all TRUE (b, row) pairs
    if teacher_feat is None:
        return loss_student
    loss_cross = jnp.sum(cs) / (jnp.sum(cc) + _EPS_LOG)
    return loss_student + lambda_cross * loss_cross
