"""Golden tests against the REFERENCE's own torch modules.

Every other loss test in this suite compares against torch math
re-written by the test author — which could share a misreading with the
implementation. These tests import the reference's actual files
(`/root/reference/code/utils/{dycon_losses,losses,ramps}.py` — pure
torch/numpy, no monai/cuda imports) and assert our jnp implementations
reproduce their outputs on fixed random tensors, fp32, across every
branch the trainers exercise (focal, teacher cross-negatives, gambling,
the UnCL broadcast quirk), for all three FeCL execution strategies
(dense / chunked / fused custom-VJP).

The reference modules are loaded by file path under private names so
nothing from the reference tree shadows this package.
"""

from __future__ import annotations

import importlib.util
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dycon_paper_replication_tpu.ops import dycon, fecl_fused, losses, ramps

REF_UTILS = "/root/reference/code/utils"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_dycon = _load("_ref_dycon_losses", f"{REF_UTILS}/dycon_losses.py")
ref_losses = _load("_ref_losses", f"{REF_UTILS}/losses.py")
ref_ramps = _load("_ref_ramps", f"{REF_UTILS}/ramps.py")


def _t(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------- ramps


@pytest.mark.parametrize("current", [0, 1, 7.5, 40, 200])
def test_sigmoid_rampup_matches_reference(current):
    for length in (0, 40.0, 200.0):
        assert ramps.sigmoid_rampup(current, length) == pytest.approx(
            ref_ramps.sigmoid_rampup(current, length), rel=1e-12
        )


def test_linear_and_cosine_ramps_match_reference():
    for cur in (0, 3, 10):
        assert ramps.linear_rampup(cur, 10) == pytest.approx(
            ref_ramps.linear_rampup(cur, 10), rel=1e-12
        )
        assert ramps.cosine_rampdown(cur, 10) == pytest.approx(
            ref_ramps.cosine_rampdown(cur, 10), rel=1e-12
        )


@pytest.mark.parametrize("epoch", [0, 13, 499, 1000])
def test_adaptive_beta_matches_reference(epoch):
    assert ramps.adaptive_beta(epoch, 1000, 5.0, 0.5) == pytest.approx(
        ref_dycon.adaptive_beta(epoch, 1000, 5.0, 0.5), rel=1e-12
    )


@pytest.mark.parametrize("epoch", [0, 100, 1999, 2000, 5000])
def test_threshold_rampup_matches_reference(epoch):
    # FeCL's focal thresholds: the reference uses its own 4-arg
    # sigmoid_rampup (dycon_losses.py:28-47), distinct from ramps.py's
    for lo, hi in ((1.3, 1.5), (0.3, 0.5)):
        assert ramps.threshold_rampup(epoch, 2000, lo, hi) == pytest.approx(
            ref_dycon.sigmoid_rampup(epoch, 2000, lo, hi), rel=1e-12
        )


def test_gambling_softmax_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 2, 8, 8, 4)).astype(np.float32)
    ref = ref_dycon.gambling_softmax(_t(logits)).numpy()  # softmax over dim 1
    ours = np.asarray(dycon.gambling_softmax(jnp.moveaxis(jnp.asarray(logits), 1, -1)))
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, rtol=2e-6, atol=2e-7)


# ---------------------------------------------------------------- UnCL


@pytest.mark.parametrize("beta", [0.5, 2.0, 5.0])
def test_uncl_matches_reference(beta):
    rng = np.random.default_rng(1)
    s = rng.normal(size=(3, 2, 6, 5, 4)).astype(np.float32) * 2.0
    t = rng.normal(size=(3, 2, 6, 5, 4)).astype(np.float32) * 2.0
    ref = ref_dycon.UnCLoss()(_t(s), _t(t), beta).item()
    ours = float(
        dycon.uncl_loss(
            jnp.moveaxis(jnp.asarray(s), 1, -1), jnp.moveaxis(jnp.asarray(t), 1, -1), beta
        )
    )
    assert ours == pytest.approx(ref, rel=1e-5)


# ---------------------------------------------------------------- FeCL


def _fecl_inputs(seed=2, B=2, N=64, D=16):
    rng = np.random.default_rng(seed)
    feat = rng.normal(size=(B, N, D)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    # binary mask with both classes well represented (every row has >= 1
    # positive pair, the regime the trainers guarantee)
    mask = (rng.random((B, N)) < 0.5).astype(np.float32)
    for b in range(B):
        mask[b, :2] = 0.0
        mask[b, 2:4] = 1.0
    tfeat = rng.normal(size=(B, N, D)).astype(np.float32)
    tfeat /= np.linalg.norm(tfeat, axis=-1, keepdims=True)
    gamb = rng.random((B, N)).astype(np.float32)
    return feat, mask, tfeat, gamb


def _ref_fecl(feat, mask, tfeat=None, gamb=None, use_focal=False, epoch=0):
    mod = ref_dycon.FeCLoss(device="cpu", temperature=0.6, gamma=2.0,
                            use_focal=use_focal, rampup_epochs=2000)
    with torch.no_grad():
        out = mod(
            _t(feat),
            _t(mask[:, None, :]),  # reference takes (B, 1, N)
            teacher_feat=None if tfeat is None else _t(tfeat),
            gambling_uncertainty=None if gamb is None else _t(gamb),
            epoch=epoch,
        )
    return float(out)


def _our_fecl_impls(use_focal, epoch):
    pos_t = ramps.threshold_rampup(epoch, 2000, 1.3, 1.5)
    neg_t = ramps.threshold_rampup(epoch, 2000, 0.3, 0.5)
    kw = dict(temperature=0.6, gamma=2.0, use_focal=use_focal,
              pos_thresh=pos_t, neg_thresh=neg_t, lambda_cross=1.0)
    return [
        ("dense", lambda f, m, t, g: dycon.fecl_loss(f, m, t, g, **kw)),
        ("chunked", lambda f, m, t, g: dycon.fecl_loss_chunked(
            f, m, t, g, row_chunk=16, **kw)),
        ("fused", lambda f, m, t, g: fecl_fused.fecl_loss_fused(
            f, m, t, g, row_chunk=16, **kw)),
    ]


@pytest.mark.parametrize("branch", ["plain", "focal", "focal_teacher", "gambling"])
@pytest.mark.parametrize("epoch", [0, 700])
def test_fecl_matches_reference(branch, epoch):
    feat, mask, tfeat, gamb = _fecl_inputs()
    use_focal = branch.startswith("focal")
    t_in = tfeat if branch == "focal_teacher" else None
    g_in = gamb if branch == "gambling" else None
    ref = _ref_fecl(feat, mask, t_in, g_in, use_focal=use_focal, epoch=epoch)
    jf, jm = jnp.asarray(feat), jnp.asarray(mask)
    jt = None if t_in is None else jnp.asarray(t_in)
    jg = None if g_in is None else jnp.asarray(g_in)
    for name, fn in _our_fecl_impls(use_focal, epoch):
        ours = float(fn(jf, jm, jt, jg))
        assert ours == pytest.approx(ref, rel=2e-4), (name, branch, epoch)


def test_fecl_gradient_matches_reference():
    """Student-feat gradient of the focal branch against torch autograd
    on the reference module itself."""
    feat, mask, _, _ = _fecl_inputs()
    t_feat = _t(feat).requires_grad_(True)
    mod = ref_dycon.FeCLoss(device="cpu", temperature=0.6, gamma=2.0,
                            use_focal=True, rampup_epochs=2000)
    loss = mod(t_feat, _t(mask[:, None, :]), epoch=700)
    loss.backward()
    ref_grad = t_feat.grad.numpy()

    pos_t = ramps.threshold_rampup(700, 2000, 1.3, 1.5)
    neg_t = ramps.threshold_rampup(700, 2000, 0.3, 0.5)
    ours = jax.grad(
        lambda f: dycon.fecl_loss(
            f, jnp.asarray(mask), temperature=0.6, gamma=2.0, use_focal=True,
            pos_thresh=pos_t, neg_thresh=neg_t,
        )
    )(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(ours), ref_grad, rtol=5e-4, atol=1e-6)


# ------------------------------------------------------------- losses.py


def test_dice_loss_matches_reference():
    rng = np.random.default_rng(3)
    score = rng.random((2, 8, 8, 6)).astype(np.float32)
    target = (rng.random((2, 8, 8, 6)) < 0.3).astype(np.float32)
    ref = float(ref_losses.dice_loss(_t(score), _t(target)))
    ours = float(losses.dice_loss(jnp.asarray(score), jnp.asarray(target)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_softmax_mse_loss_matches_reference():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 2, 6, 6, 4)).astype(np.float32)
    b = rng.normal(size=(2, 2, 6, 6, 4)).astype(np.float32)
    ref = ref_losses.softmax_mse_loss(_t(a), _t(b)).numpy()  # elementwise map
    ours = np.asarray(
        losses.softmax_mse_loss(jnp.moveaxis(jnp.asarray(a), 1, -1),
                                jnp.moveaxis(jnp.asarray(b), 1, -1))
    )
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, rtol=1e-5, atol=1e-7)


def test_softmax_kl_loss_matches_reference():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(2, 2, 6, 6, 4)).astype(np.float32)
    b = rng.normal(size=(2, 2, 6, 6, 4)).astype(np.float32)
    ref = float(ref_losses.softmax_kl_loss(_t(a), _t(b)))
    ours = float(
        losses.softmax_kl_loss(jnp.moveaxis(jnp.asarray(a), 1, -1),
                               jnp.moveaxis(jnp.asarray(b), 1, -1))
    )
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-7)


def test_symmetric_mse_loss_matches_reference():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(3, 7, 5)).astype(np.float32)
    b = rng.normal(size=(3, 7, 5)).astype(np.float32)
    ref = float(ref_losses.symmetric_mse_loss(_t(a), _t(b)))
    ours = float(losses.symmetric_mse_loss(jnp.asarray(a), jnp.asarray(b)))
    assert ours == pytest.approx(ref, rel=1e-6)


def test_cross_entropy_matches_torch_module():
    # the trainers use nn.CrossEntropyLoss (train_DyCON_Pancreas.py:141)
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 2, 6, 5, 4)).astype(np.float32)
    labels = rng.integers(0, 2, size=(2, 6, 5, 4))
    ref = float(torch.nn.CrossEntropyLoss()(_t(logits), _t(labels).long()))
    ours = float(
        losses.cross_entropy_loss(jnp.moveaxis(jnp.asarray(logits), 1, -1),
                                  jnp.asarray(labels))
    )
    assert ours == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("gamma", [0.0, 2.0])
def test_focal_loss_matches_reference(gamma):
    rng = np.random.default_rng(8)
    logits = rng.normal(size=(2, 2, 6, 5, 4)).astype(np.float32)
    labels = rng.integers(0, 2, size=(2, 6, 5, 4))
    ref = float(ref_losses.FocalLoss(gamma=gamma)(_t(logits), _t(labels).long()))
    ours = float(
        losses.focal_loss(jnp.moveaxis(jnp.asarray(logits), 1, -1),
                          jnp.asarray(labels), gamma=gamma)
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_focal_loss_alpha_matches_reference():
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(2, 2, 6, 5, 4)).astype(np.float32)
    labels = rng.integers(0, 2, size=(2, 6, 5, 4))
    ref = float(
        ref_losses.FocalLoss(gamma=2.0, alpha=0.25)(_t(logits), _t(labels).long())
    )
    ours = float(
        losses.focal_loss(jnp.moveaxis(jnp.asarray(logits), 1, -1),
                          jnp.asarray(labels), gamma=2.0,
                          alpha=jnp.asarray([0.25, 0.75]))
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_dice_loss_nclass_matches_reference():
    # reference DiceLoss module (ISLES trainer, train_DyCON_ISLES22.py)
    rng = np.random.default_rng(10)
    logits = rng.normal(size=(2, 3, 6, 5, 4)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 6, 5, 4))
    ref = float(
        ref_losses.DiceLoss(n_classes=3)(_t(logits), _t(labels[:, None]).float(),
                                         softmax=True)
    )
    probs = jax.nn.softmax(jnp.moveaxis(jnp.asarray(logits), 1, -1), axis=-1)
    ours = float(losses.dice_loss_nclass(probs, jnp.asarray(labels), 3))
    assert ours == pytest.approx(ref, rel=1e-5)
