"""Golden tests for losses: compare the jnp implementations against
independent PyTorch formulations written here from the published math
(layout: torch uses NCDHW, ours uses NDHWC — tests transpose)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from dycon_paper_replication_tpu.ops import losses, dycon, ramps


def _to_channels_last(x_torch):
    # (B, C, D1, D2, D3) -> (B, D1, D2, D3, C)
    return jnp.asarray(np.moveaxis(x_torch.numpy(), 1, -1))


class TestSupervised:
    def test_cross_entropy(self, rng):
        logits = torch.tensor(rng.normal(size=(4, 2, 8, 8, 6)).astype(np.float32))
        labels = torch.tensor(rng.integers(0, 2, size=(4, 8, 8, 6)))
        want = TF.cross_entropy(logits, labels).item()
        got = losses.cross_entropy_loss(_to_channels_last(logits), jnp.asarray(labels.numpy()))
        assert np.isclose(got, want, atol=1e-6)

    def test_dice_loss(self, rng):
        score = rng.uniform(size=(4, 8, 8, 6)).astype(np.float32)
        target = rng.integers(0, 2, size=(4, 8, 8, 6)).astype(np.float32)
        s, t = torch.tensor(score), torch.tensor(target)
        smooth = 1e-5
        inter = (s * t).sum()
        want = (1 - (2 * inter + smooth) / ((s * s).sum() + (t * t).sum() + smooth)).item()
        got = losses.dice_loss(jnp.asarray(score), jnp.asarray(target))
        assert np.isclose(got, want, atol=1e-6)

    def test_dice_loss_nclass(self, rng):
        """Matches reference DiceLoss(n_classes) semantics: mean over classes
        of soft dice between probs[:, c] and one-hot target."""
        probs = torch.tensor(rng.uniform(size=(2, 3, 6, 6, 4)).astype(np.float32))
        probs = probs / probs.sum(dim=1, keepdim=True)
        labels = torch.tensor(rng.integers(0, 3, size=(2, 6, 6, 4)))
        smooth = 1e-5
        total = 0.0
        for c in range(3):
            t = (labels == c).float()
            p = probs[:, c]
            inter = (p * t).sum()
            total += 1 - (2 * inter + smooth) / ((p * p).sum() + (t * t).sum() + smooth)
        want = (total / 3).item()
        got = losses.dice_loss_nclass(_to_channels_last(probs), jnp.asarray(labels.numpy()), 3)
        assert np.isclose(got, want, atol=1e-6)

    def test_focal_loss(self, rng):
        logits = torch.tensor(rng.normal(size=(3, 2, 5, 5, 5)).astype(np.float32))
        labels = torch.tensor(rng.integers(0, 2, size=(3, 5, 5, 5)))
        flat = logits.permute(0, 2, 3, 4, 1).reshape(-1, 2)
        tflat = labels.reshape(-1)
        logpt = TF.log_softmax(flat, dim=1).gather(1, tflat[:, None])[:, 0]
        pt = logpt.exp()
        want = (-((1 - pt) ** 2.0) * logpt).mean().item()
        got = losses.focal_loss(_to_channels_last(logits), jnp.asarray(labels.numpy()), gamma=2.0)
        assert np.isclose(got, want, atol=1e-6)


class TestConsistency:
    def test_softmax_mse(self, rng):
        a = torch.tensor(rng.normal(size=(4, 2, 6, 6, 6)).astype(np.float32))
        b = torch.tensor(rng.normal(size=(4, 2, 6, 6, 6)).astype(np.float32))
        want = ((TF.softmax(a, 1) - TF.softmax(b, 1)) ** 2).mean().item()
        got = jnp.mean(losses.softmax_mse_loss(_to_channels_last(a), _to_channels_last(b)))
        assert np.isclose(got, want, atol=1e-6)

    def test_softmax_kl(self, rng):
        a = torch.tensor(rng.normal(size=(4, 2, 6, 6, 6)).astype(np.float32))
        b = torch.tensor(rng.normal(size=(4, 2, 6, 6, 6)).astype(np.float32))
        want = TF.kl_div(TF.log_softmax(a, 1), TF.softmax(b, 1), reduction="mean").item()
        got = losses.softmax_kl_loss(_to_channels_last(a), _to_channels_last(b))
        assert np.isclose(got, want, atol=1e-6)


class TestUnCL:
    @pytest.mark.parametrize("beta", [0.5, 2.0, 5.0])
    def test_matches_math(self, rng, beta):
        """Independent torch formulation of the UnCL math, including the
        documented broadcast identity mean(x_i + y_j) = mean(x) + mean(y)."""
        s = torch.tensor(rng.normal(size=(4, 2, 8, 8, 8)).astype(np.float32))
        t = torch.tensor(rng.normal(size=(4, 2, 8, 8, 8)).astype(np.float32))
        ps, pt = TF.softmax(s, 1), TF.softmax(t, 1)
        hs = -(ps * (ps + 1e-6).log()).sum(1, keepdim=True)
        ht = -(pt * (pt + 1e-6).log()).sum(1, keepdim=True)
        weighted = ((ps - pt) ** 2 / (torch.exp(beta * hs) + torch.exp(beta * ht))).sum(1)
        # replicate the (B,H,W,D)+(B,1,H,W,D) -> (B,B,H,W,D) broadcast exactly
        want = torch.mean(weighted + beta * (hs + ht)).item()
        got = dycon.uncl_loss(_to_channels_last(s), _to_channels_last(t), beta)
        assert np.isclose(got, want, atol=1e-5)


def _torch_fecl(feat, mask, teacher_feat, temperature, gamma, use_focal, pos_th, neg_th):
    """Independent torch realization of the FeCL math (including quirks:
    diagonal zeroed pre-shift, per-column max, un-tempered cross sim)."""
    B, N, _ = feat.shape
    same = (mask[:, :, None] == mask[:, None, :]).float()
    diff = 1 - same
    eye = torch.eye(N)
    logits = (feat @ feat.transpose(1, 2)) / temperature * (1 - eye)
    logits = logits - logits.max(dim=1, keepdim=True).values
    e = logits.exp()
    neg_sum = (e * diff).sum(-1, keepdim=True)
    division = e / (e + neg_sum + 1e-18)
    lm = -(division + 1e-18).log() * same * (1 - eye)
    pos_count = same.sum(-1) - 1 + 1e-18
    if use_focal:
        w = torch.ones_like(division)
        hp = (same.bool()) & (division < pos_th)
        hn = (diff.bool()) & (division > neg_th)
        w[hp] = (1 - division[hp]) ** gamma
        w[hn] = division[hn] ** gamma
        loss = ((lm * w).sum(-1) / pos_count).mean()
    else:
        loss = (lm.sum(-1) / pos_count).mean()
    if teacher_feat is not None:
        cs = feat @ teacher_feat.transpose(1, 2)
        chn = (diff.bool()) & (cs > neg_th)
        if chn.sum() > 0:
            term = -(1 - cs + 1e-18).log() * chn.float()
            loss = loss + term.sum() / (chn.float().sum() + 1e-18)
    return loss.item()


class TestFeCL:
    @pytest.mark.parametrize("use_focal,use_teacher", [(True, True), (True, False), (False, False)])
    def test_matches_math(self, rng, use_focal, use_teacher):
        B, N, D = 3, 32, 16
        feat = torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32))
        feat = TF.normalize(feat, dim=-1)
        tfeat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        mask = torch.tensor(rng.integers(0, 2, size=(B, N)).astype(np.float32))
        pos_th = ramps.threshold_rampup(10, 1500, 1.3, 1.5)
        neg_th = ramps.threshold_rampup(10, 1500, 0.3, 0.5)
        want = _torch_fecl(
            feat, mask, tfeat if use_teacher else None, 0.6, 2.0, use_focal, pos_th, neg_th
        )
        got = dycon.fecl_loss(
            jnp.asarray(feat.numpy()),
            jnp.asarray(mask.numpy()),
            jnp.asarray(tfeat.numpy()) if use_teacher else None,
            temperature=0.6,
            gamma=2.0,
            use_focal=use_focal,
            pos_thresh=pos_th,
            neg_thresh=neg_th,
        )
        # teacher branch contains -log(1 - sim): conditioning ~1/(1-sim)
        # amplifies f32 matmul rounding, so allow a wider tolerance there;
        # the focal path's exp/log chain accumulates ~1e-4 rel noise in f32
        tol = 1e-3 if use_teacher else 1e-4
        assert np.isclose(got, want, rtol=tol, atol=tol)

    def test_all_positives_are_hard(self, rng):
        """division is in (0,1] so every positive pair is below the 1.3..1.5
        ramped threshold — the quirk the framework must preserve."""
        feat = TF.normalize(torch.tensor(rng.normal(size=(2, 16, 8)).astype(np.float32)), -1)
        mask = torch.tensor(rng.integers(0, 2, size=(2, 16)).astype(np.float32))
        focal = dycon.fecl_loss(
            jnp.asarray(feat.numpy()), jnp.asarray(mask.numpy()),
            use_focal=True, pos_thresh=1.3, neg_thresh=2.0,  # neg path disabled
        )
        want = _torch_fecl(feat, mask, None, 0.6, 2.0, True, 1.3, 2.0)
        assert np.isclose(focal, want, rtol=2e-5, atol=2e-5)


class TestRamps:
    def test_sigmoid_rampup_endpoints(self):
        assert ramps.sigmoid_rampup(0, 200) == pytest.approx(np.exp(-5.0))
        assert ramps.sigmoid_rampup(200, 200) == 1.0
        assert ramps.sigmoid_rampup(500, 200) == 1.0
        assert ramps.sigmoid_rampup(5, 0) == 1.0

    def test_adaptive_beta(self):
        assert ramps.adaptive_beta(0, 100, 5.0, 0.5) == pytest.approx(5.0)
        assert ramps.adaptive_beta(100, 100, 5.0, 0.5) == pytest.approx(0.5)
        mid = ramps.adaptive_beta(50, 100, 5.0, 0.5)
        assert 0.5 < mid < 5.0 and mid == pytest.approx(np.sqrt(2.5))

    def test_threshold_rampup(self):
        assert ramps.threshold_rampup(0, 1500, 1.3, 1.5) == pytest.approx(1.3 + 0.2 * np.exp(-5))
        assert ramps.threshold_rampup(1500, 1500, 1.3, 1.5) == pytest.approx(1.5)
        assert ramps.threshold_rampup(7, 0, 1.3, 1.5) == 1.5

    def test_poly_lr(self):
        assert ramps.poly_lr(0.01, 0, 100) == pytest.approx(0.01)
        assert ramps.poly_lr(0.01, 50, 100) == pytest.approx(0.01 * 0.5**0.9)


class TestFeCLChunked:
    @pytest.mark.parametrize("use_teacher", [False, True])
    def test_matches_dense(self, rng, use_teacher):
        B, N, D = 2, 64, 16
        feat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        tfeat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        mask = torch.tensor(rng.integers(0, 2, size=(B, N)).astype(np.float32))
        kw = dict(temperature=0.6, gamma=2.0, use_focal=True, pos_thresh=1.4, neg_thresh=0.35)
        f, m = jnp.asarray(feat.numpy()), jnp.asarray(mask.numpy())
        t = jnp.asarray(tfeat.numpy()) if use_teacher else None
        dense = dycon.fecl_loss(f, m, t, **kw)
        chunked = dycon.fecl_loss_chunked(f, m, t, row_chunk=16, **kw)
        assert np.isclose(chunked, dense, rtol=1e-5, atol=1e-5), (chunked, dense)

    def test_grads_match_dense(self, rng):
        import jax
        B, N, D = 2, 32, 8
        feat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        mask = torch.tensor(rng.integers(0, 2, size=(B, N)).astype(np.float32))
        f, m = jnp.asarray(feat.numpy()), jnp.asarray(mask.numpy())
        kw = dict(temperature=0.6, use_focal=True, pos_thresh=1.4, neg_thresh=0.35)
        g_dense = jax.grad(lambda x: dycon.fecl_loss(x, m, None, **kw))(f)
        g_chunk = jax.grad(lambda x: dycon.fecl_loss_chunked(x, m, None, row_chunk=8, **kw))(f)
        np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_dense), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("use_teacher", [False, True])
    def test_gambling_matches_dense(self, rng, use_teacher):
        # non-None gambling_uncertainty replaces the focal student term
        # with gambling-weighted unfocal row means in BOTH paths
        B, N, D = 2, 64, 16
        feat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        tfeat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        mask = torch.tensor(rng.integers(0, 2, size=(B, N)).astype(np.float32))
        gamb = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, N)).astype(np.float32))
        kw = dict(temperature=0.6, gamma=2.0, use_focal=True, pos_thresh=1.4, neg_thresh=0.35)
        f, m = jnp.asarray(feat.numpy()), jnp.asarray(mask.numpy())
        t = jnp.asarray(tfeat.numpy()) if use_teacher else None
        dense = dycon.fecl_loss(f, m, t, gamb, **kw)
        chunked = dycon.fecl_loss_chunked(f, m, t, gamb, row_chunk=16, **kw)
        assert np.isclose(chunked, dense, rtol=1e-5, atol=1e-5), (chunked, dense)
        # and gambling actually changes the value vs the focal path
        assert not np.isclose(dense, dycon.fecl_loss(f, m, t, None, **kw))

    @pytest.mark.parametrize("use_teacher,use_gamb", [(False, False), (True, False), (True, True)])
    def test_indivisible_pads_and_matches_dense(self, rng, use_teacher, use_gamb, monkeypatch):
        """N % row_chunk != 0 takes the PADDED chunked path (masked pad
        rows, sentinel class), not a dense fallback (VERDICT r4 #7):
        value and feat-grad match dense for every operand combination."""
        import jax
        B, N, D = 2, 10, 8
        feat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        tfeat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        mask = torch.tensor(rng.integers(0, 2, size=(B, N)).astype(np.float32))
        f, m = jnp.asarray(feat.numpy()), jnp.asarray(mask.numpy())
        t = jnp.asarray(tfeat.numpy()) if use_teacher else None
        g = (jnp.asarray(rng.uniform(0.1, 1.0, size=(B, N)).astype(np.float32))
             if use_gamb else None)
        kw = dict(temperature=0.6, gamma=2.0, use_focal=True,
                  pos_thresh=1.4, neg_thresh=0.35)
        dense = dycon.fecl_loss(f, m, t, g, **kw)
        # prove no dense fallback: the chunked path must not call fecl_loss
        monkeypatch.setattr(dycon, "fecl_loss", lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("fecl_loss_chunked fell back to dense")))
        chunked = dycon.fecl_loss_chunked(f, m, t, g, row_chunk=16, **kw)
        assert np.isclose(chunked, dense, rtol=1e-5, atol=1e-5), (chunked, dense)
        monkeypatch.undo()
        g_dense = jax.grad(lambda x: dycon.fecl_loss(x, m, t, g, **kw))(f)
        g_chunk = jax.grad(lambda x: dycon.fecl_loss_chunked(x, m, t, g, row_chunk=16, **kw))(f)
        np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_dense), rtol=1e-4, atol=1e-5)

    def test_indivisible_all_one_class(self, rng):
        """Degenerate odd-N mask (all class 1): the -1 pad sentinel must
        land in neither class's positive set nor the negative set."""
        B, N, D = 1, 7, 8
        feat = TF.normalize(torch.tensor(rng.normal(size=(B, N, D)).astype(np.float32)), dim=-1)
        f = jnp.asarray(feat.numpy())
        m = jnp.ones((B, N), jnp.float32)
        kw = dict(pos_thresh=1.4, neg_thresh=0.35)
        dense = dycon.fecl_loss(f, m, None, **kw)
        chunked = dycon.fecl_loss_chunked(f, m, None, row_chunk=4, **kw)
        assert np.isclose(chunked, dense, rtol=1e-5, atol=1e-6), (chunked, dense)
