"""FeCL with an analytic custom-VJP backward (flash-style, chunked).

`ops.dycon.fecl_loss_chunked` already bounds memory by scanning row
tiles under `jax.checkpoint`, but its backward pays ~50% recompute: XLA
re-runs the whole forward elementwise chain per tile and then transposes
it. The focal InfoNCE gradient has a closed form, so this module saves
three O(N) residual vectors per item in the forward and runs ONE
backward pass per tile that evaluates the gradient directly.

Math (same quirks as ops/dycon.py — see its module docstring; reference
/root/reference/code/utils/dycon_losses.py:150-235):

  per row i:  L_ij = (f_i . f_j)/tau (diag zeroed),  M_j = max_i L_ij
  (stop-grad), E = exp(L - M), S_i = sum_j E_ij diff_ij,
  v_ij = E_ij / (E_ij + S_i + eps),
  student row term = sum_{j in same, j!=i} phi(v_ij),
  phi(v) = -log(v+eps) * c(v),  c(v) = (1-v)^gamma if v < pos_thresh
  else 1 (focal; c == 1 unfocal / gambling-weighted).

With psi = phi'(v), den = E + S + eps, the gradient through the student
term is

  dL_ij = a_i * [ same_ij * psi_ij * (S_i+eps) * E_ij / den_ij^2
                  + rho_i * diff_ij * E_ij ]
  rho_i = sum_k same_ik * psi_ik * (-E_ik / den_ik^2)
  dF    = (dL + dL^T) @ F / tau   (+ cross-term dcs @ T)

where a_i folds the upstream cotangent, the 1/(B*N) mean, the
positive-count normalizer and the optional gambling weight. The
forward saves (M, S, rho) — O(B*N) — so the backward needs a single
tile pass (L recompute + two accumulation matmuls).

Teacher gradient: the trainer always calls this behind
`jax.lax.stop_gradient` on the teacher embeddings (mean-teacher
semantics, reference trains the same way), so the VJP returns a ZERO
cotangent for `teacher_feat`. Do not use this function where teacher
gradients are needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .dycon import _EPS_LOG, fecl_loss_chunked

_F32 = jnp.float32


def _phi_psi(v, pos_thresh, gamma, use_focal):
    """phi(v) (row loss term) and psi(v) = phi'(v) for same-class pairs."""
    logv = jnp.log(v + _EPS_LOG)
    if not use_focal:
        return -logv, -1.0 / (v + _EPS_LOG)
    focal = v < pos_thresh
    c = jnp.where(focal, (1.0 - v) ** gamma, 1.0)
    phi = -logv * c
    dc = jnp.where(focal, -gamma * (1.0 - v) ** (gamma - 1.0), 0.0)
    psi = -c / (v + _EPS_LOG) - logv * dc
    return phi, psi


@functools.lru_cache(maxsize=32)
def _build(temperature, gamma, use_focal, lambda_cross, row_chunk, n_valid=None):
    """Returns the custom-VJP'd core for one static config.

    `n_valid` (static) is the TRUE row count when the caller padded the
    row axis up to a row_chunk multiple (sentinel class -1, zero
    embeddings): validity masks keep pad rows/columns out of every
    positive/negative set and the means divide by `n_valid`. None means
    the inputs are unpadded (identical trace to the pre-padding code)."""

    def _per_item_fwd(feat, mask, tfeat, focal_eff, pos_t, neg_t):
        N, D = feat.shape
        T = row_chunk
        n_tiles = N // T
        row_ids = jnp.arange(N)
        f_tiles = feat.reshape(n_tiles, T, D)
        id_tiles = row_ids.reshape(n_tiles, T)
        m_tiles = mask.reshape(n_tiles, T)

        def colmax_body(carry, xs):
            f_t, ids = xs
            l_t = jnp.einsum("td,nd->tn", f_t, feat, preferred_element_type=_F32) / temperature
            l_t = l_t * (ids[:, None] != row_ids[None, :]).astype(l_t.dtype)
            return jnp.maximum(carry, jnp.max(l_t, axis=0)), None

        col_max, _ = jax.lax.scan(
            colmax_body, jnp.full((N,), -jnp.inf, _F32), (f_tiles, id_tiles)
        )
        col_max = jax.lax.stop_gradient(col_max)

        def tile_body(carry, xs):
            f_t, ids, m_t = xs
            same = (m_t[:, None] == mask[None, :]).astype(_F32)
            off = (ids[:, None] != row_ids[None, :]).astype(_F32)
            diff = 1.0 - same
            if n_valid is not None:
                # sentinel keeps pad columns out of `same`; keep their
                # exp(0 - col_max) out of the negative sums too
                diff = diff * (row_ids < n_valid).astype(_F32)[None, :]
            l_t = jnp.einsum("td,nd->tn", f_t, feat, preferred_element_type=_F32) / temperature
            l_t = l_t * off
            e_t = jnp.exp(l_t - col_max[None, :])
            s_row = jnp.sum(e_t * diff, axis=-1)  # (T,)
            den = e_t + s_row[:, None] + _EPS_LOG
            v = e_t / den
            phi, psi = _phi_psi(v, pos_t, gamma, focal_eff)
            so = same * off
            row_sum = jnp.sum(phi * so, axis=-1)
            row_sum_unf = jnp.sum(-jnp.log(v + _EPS_LOG) * so, axis=-1)
            rho_row = jnp.sum(so * psi * (-e_t / (den * den)), axis=-1)  # sum_k psi * dv_ik/dS_i
            if tfeat is None:
                c_sum = c_cnt = jnp.zeros((), _F32)
            else:
                cs = jnp.einsum("td,nd->tn", f_t, tfeat, preferred_element_type=_F32)
                hard = (diff > 0) & (cs > neg_t)
                if n_valid is not None:
                    hard = hard & (ids[:, None] < n_valid)
                c_sum = jnp.sum(
                    jnp.where(hard, -jnp.log(jnp.maximum(1.0 - cs, 0.0) + _EPS_LOG), 0.0)
                )
                c_cnt = jnp.sum(hard.astype(_F32))
            return (carry[0] + c_sum, carry[1] + c_cnt), (row_sum, row_sum_unf, s_row, rho_row)

        (c_sum, c_cnt), (row_sums, row_sums_unf, s_all, rho_all) = jax.lax.scan(
            tile_body, (jnp.zeros((), _F32),) * 2, (f_tiles, id_tiles, m_tiles)
        )
        row_sums = row_sums.reshape(N)
        row_sums_unf = row_sums_unf.reshape(N)
        s_all = s_all.reshape(N)
        rho_all = rho_all.reshape(N)

        # pos_count is NOT computed here: an (N,N) comparison would defeat
        # chunking; the caller gets it in O(N) from _pos_count instead.
        return (row_sums, row_sums_unf, s_all, rho_all, col_max, c_sum, c_cnt)

    def _pos_count(mask):
        # rows sharing my class, minus self: the mask is binary {0,1}
        # (trainer thresholds it), but support any small int class set by
        # summing equality against the row's own value via sort-free
        # histogram over unique values is overkill — the mask values are
        # floats from a threshold, so a direct count works in O(N):
        if n_valid is not None:
            # pad rows carry the -1 sentinel: count both classes
            # explicitly so pads land in neither histogram bucket
            n1 = jnp.sum((mask == 1).astype(_F32))
            n0 = jnp.sum((mask == 0).astype(_F32))
            return jnp.where(mask > 0, n1, n0) - 1.0
        n1 = jnp.sum(mask)  # count of class "1" (mask values are 0/1)
        n = mask.shape[0]
        return jnp.where(mask > 0, n1, n - n1) - 1.0

    def _fwd_value(feat, mask, tfeat, gamb, pos_t, neg_t):
        B, N, D = feat.shape

        mapped = {"f": feat, "m": mask}
        if tfeat is not None:
            mapped["t"] = tfeat

        focal_eff = use_focal and gamb is None

        def one(d):
            return _per_item_fwd(d["f"], d["m"], d.get("t"), focal_eff, pos_t, neg_t)

        (row_sums, row_sums_unf, s_all, rho_all, col_max, c_sum, c_cnt) = jax.vmap(one)(
            mapped
        )
        pos_count = jax.vmap(_pos_count)(mask)
        w = jnp.where(pos_count > 0, 1.0 / jnp.maximum(pos_count, 1.0), 0.0)  # (B,N)
        if n_valid is not None:
            # pad rows form sentinel-class "positives" among themselves;
            # zeroing w here kills their forward contribution AND their
            # backward a_all scaling in one place
            w = w * (jnp.arange(N) < n_valid).astype(_F32)[None, :]
        if gamb is not None:
            row_mean = row_sums_unf * w * gamb
        elif use_focal:
            row_mean = row_sums * w
        else:
            row_mean = row_sums_unf * w
        loss_student = jnp.sum(row_mean) / (B * (N if n_valid is None else n_valid))
        cnt_total = jnp.sum(c_cnt)
        if tfeat is None:
            loss = loss_student
        else:
            loss = loss_student + lambda_cross * jnp.sum(c_sum) / (cnt_total + _EPS_LOG)
        res = (feat, mask, tfeat, gamb, pos_t, neg_t, s_all, rho_all, col_max,
               row_sums_unf, w, cnt_total)
        return loss, res

    @jax.custom_vjp
    def core(feat, mask, tfeat, gamb, pos_t, neg_t):
        return _fwd_value(feat, mask, tfeat, gamb, pos_t, neg_t)[0]

    def core_fwd(feat, mask, tfeat, gamb, pos_t, neg_t):
        return _fwd_value(feat, mask, tfeat, gamb, pos_t, neg_t)

    def core_bwd(res, gbar):
        (feat, mask, tfeat, gamb, pos_t, neg_t, s_all, rho_all, col_max,
         row_sums_unf, w, cnt_total) = res
        B, N, D = feat.shape
        T = row_chunk
        n_tiles = N // T
        gbar = gbar.astype(_F32)
        denom_rows = B * (N if n_valid is None else n_valid)
        a_all = (gbar / denom_rows) * w  # (B,N); w is zero on pad rows
        if gamb is not None:
            a_all = a_all * gamb
        g_cross = gbar * lambda_cross / (cnt_total + _EPS_LOG)

        def per_item_bwd(feat_b, mask_b, tfeat_b, a_b, s_b, rho_b, cmax_b):
            row_ids = jnp.arange(N)
            f_tiles = feat_b.reshape(n_tiles, T, D)
            id_tiles = row_ids.reshape(n_tiles, T)
            m_tiles = mask_b.reshape(n_tiles, T)
            a_tiles = a_b.reshape(n_tiles, T)
            s_tiles = s_b.reshape(n_tiles, T)
            rho_tiles = rho_b.reshape(n_tiles, T)

            def tile_body(dcols, xs):
                f_t, ids, m_t, a_t, s_t, rho_t = xs
                same = (m_t[:, None] == mask_b[None, :]).astype(_F32)
                off = (ids[:, None] != row_ids[None, :]).astype(_F32)
                diff = 1.0 - same
                if n_valid is not None:
                    diff = diff * (row_ids < n_valid).astype(_F32)[None, :]
                l_t = jnp.einsum("td,nd->tn", f_t, feat_b, preferred_element_type=_F32) / temperature
                l_t = l_t * off
                e_t = jnp.exp(l_t - cmax_b[None, :])
                den = e_t + s_t[:, None] + _EPS_LOG
                v = e_t / den
                _, psi = _phi_psi(v, pos_t, gamma, use_focal and gamb is None)
                dl = a_t[:, None] * (
                    same * off * psi * (s_t[:, None] + _EPS_LOG) * e_t / (den * den)
                    + rho_t[:, None] * diff * e_t
                )
                drows = jnp.einsum("tn,nd->td", dl, feat_b, preferred_element_type=_F32) / temperature
                if tfeat_b is not None:
                    cs = jnp.einsum("td,nd->tn", f_t, tfeat_b, preferred_element_type=_F32)
                    hard = (diff > 0) & (cs > neg_t) & (cs < 1.0)
                    if n_valid is not None:
                        hard = hard & (ids[:, None] < n_valid)
                    dcs = jnp.where(
                        hard, g_cross / (jnp.maximum(1.0 - cs, 0.0) + _EPS_LOG), 0.0
                    )
                    drows = drows + jnp.einsum(
                        "tn,nd->td", dcs, tfeat_b, preferred_element_type=_F32
                    )
                dcols = dcols + jnp.einsum("tn,td->nd", dl, f_t, preferred_element_type=_F32) / temperature
                return dcols, drows

            dcols, drows = jax.lax.scan(
                tile_body,
                jnp.zeros((N, D), _F32),
                (f_tiles, id_tiles, m_tiles, a_tiles, s_tiles, rho_tiles),
            )
            return dcols + drows.reshape(N, D)

        mapped = {"f": feat, "m": mask, "a": a_all, "s": s_all, "r": rho_all, "c": col_max}
        if tfeat is not None:
            mapped["t"] = tfeat
        dfeat = jax.vmap(
            lambda d: per_item_bwd(d["f"], d["m"], d.get("t"), d["a"], d["s"], d["r"], d["c"])
        )(mapped)

        dgamb = None
        if gamb is not None:
            dgamb = (gbar / denom_rows) * row_sums_unf * w
        dtfeat = None if tfeat is None else jnp.zeros_like(tfeat)
        return (dfeat.astype(feat.dtype), jnp.zeros_like(mask), dtfeat, dgamb,
                jnp.zeros_like(pos_t), jnp.zeros_like(neg_t))

    core.defvjp(core_fwd, core_bwd)
    return core


def fecl_loss_fused(
    feat: jnp.ndarray,
    mask: jnp.ndarray,
    teacher_feat: jnp.ndarray | None = None,
    gambling_uncertainty: jnp.ndarray | None = None,
    *,
    temperature: float = 0.6,
    gamma: float = 2.0,
    use_focal: bool = True,
    pos_thresh=1.5,
    neg_thresh=0.5,
    lambda_cross: float = 1.0,
    row_chunk: int = 512,
) -> jnp.ndarray:
    """Drop-in replacement for `fecl_loss_chunked` with analytic backward.

    Value and feat-gradient match `fecl_loss`/`fecl_loss_chunked` (tested);
    the teacher cotangent is ZERO by design (see module docstring). When
    N % row_chunk != 0 the row axis is padded with masked-out rows
    (sentinel class -1, zero embeddings) so the fused tile-memory bound
    holds for any N (VERDICT r4 #7); the cotangent of the pad slices off
    through `jnp.pad`'s transpose.

    `mask` must be BINARY {0, 1} (the trainer's thresholded contrastive
    mask): the positive-pair count is derived from the class-1 histogram
    instead of an (N, N) comparison.
    """
    B, N, D = feat.shape
    n_valid = None
    if N % row_chunk:
        pad = row_chunk - N % row_chunk
        n_valid = N
        feat = jnp.pad(feat, ((0, 0), (0, pad), (0, 0)))
        # f32 sentinel (a bool/uint8 mask would wrap -1 onto a real
        # class; int would change the custom-VJP cotangent dtype)
        mask = jnp.concatenate(
            [mask.astype(_F32), jnp.full((B, pad), -1.0, _F32)], axis=1
        )
        if teacher_feat is not None:
            teacher_feat = jnp.pad(teacher_feat, ((0, 0), (0, pad), (0, 0)))
        if gambling_uncertainty is not None:
            gambling_uncertainty = jnp.pad(gambling_uncertainty, ((0, 0), (0, pad)))
    core = _build(float(temperature), float(gamma), bool(use_focal),
                  float(lambda_cross), int(row_chunk), n_valid)
    return core(
        feat.astype(_F32),
        mask,
        None if teacher_feat is None else teacher_feat.astype(_F32),
        gambling_uncertainty,
        jnp.asarray(pos_thresh, _F32),
        jnp.asarray(neg_thresh, _F32),
    )
