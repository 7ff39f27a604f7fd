"""Fold-2 execution engine (ops/folding.py, models/unet3d_folded.py).

Every folded primitive must match its plain-NDHWC counterpart exactly
(up to f32 reassociation), and the full folded UNet3D forward must match
the unfolded model on the SAME params pytree. Parity target: the 3^3
conv stacks of /root/reference/code/networks/utils.py:99-124 as composed
by UNet3D (/root/reference/code/networks/UNet3D_contrastive.py:207-322).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from dycon_paper_replication_tpu.models import layers as L
from dycon_paper_replication_tpu.models import net_factory_3d
from dycon_paper_replication_tpu.ops import folding
from dycon_paper_replication_tpu.ops.resize import max_pool_2x, upsample2x


def _conv3_same(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    return y if b is None else y + b


class TestFoldingPrimitives:
    def test_fold_unfold_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 4, 3)), jnp.float32)
        y = folding.unfold2(folding.fold2(x))
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        assert folding.fold2(x).shape == (2, 4, 6, 2, 24)

    def test_conv_pair_matches_two_same_convs(self, rng):
        """phase-0 -> phase-1 (masked) -> phase-0 == two 3^3 SAME convs."""
        B, D, H, W, C = 2, 8, 8, 16, 5
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

        want = _conv3_same(_conv3_same(x, w1, b1), w2)

        grid = (D // 2, H // 2, W // 2)
        h = folding.folded_conv3(folding.fold2(x), w1, b1, to_phase=1)
        m = folding.phase1_mask(tuple(g + 1 for g in grid))
        h = folding.apply_lane_mask(h, m)  # zero the padding planes incl. bias
        y = folding.unfold2(folding.folded_conv3(h, w2, None, to_phase=0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-4, rtol=1e-4)

    def test_instance_norm_folded_phase0(self, rng):
        B, D, H, W, C = 2, 8, 8, 8, 4
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)) * 3 + 1, jnp.float32)
        want = L.instance_norm(x.astype(jnp.float32), channel_axis=-1)
        got = folding.unfold2(
            folding.instance_norm_folded(folding.fold2(x), n_valid=D * H * W)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)

    def test_instance_norm_folded_phase1_masks_padding(self, rng):
        """Phase-1 stats must exclude the boundary planes (which hold
        out-of-range conv outputs): compare against plain IN over the
        valid voxels only."""
        B, D, H, W, C = 1, 8, 8, 8, 4
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)) * 2 - 0.5, jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        want = L.instance_norm(_conv3_same(x, w, b), channel_axis=-1)

        grid = (D // 2 + 1, H // 2 + 1, W // 2 + 1)
        masks = folding.phase1_lane_masks(grid, C)
        h = folding.folded_conv3(folding.fold2(x), w, b, to_phase=1)
        got = folding.instance_norm_folded(h, n_valid=D * H * W, masks=masks)
        # unfold a phase-1 tensor by dropping the two padding planes per axis
        got = folding.unfold2(got)[:, 1:-1, 1:-1, 1:-1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)

    def test_lane_masks_factorization(self):
        """Product of the three factored lane masks == the simple
        (..., 1, 8) phase-1 mask broadcast to full lane width."""
        grid, C = (3, 5, 4), 2
        md, mh, mw = folding.phase1_lane_masks(grid, C)
        got = np.asarray(md * mh * mw)  # (1, *grid, 8C)
        simple = np.asarray(folding.phase1_mask(grid))  # (1, *grid, 1, 8)
        want = np.tile(simple[..., 0, :], (1, 1, 1, 1, C))
        np.testing.assert_array_equal(got, want)

    def test_pool_consume_and_refold(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 16, 6)), jnp.float32)
        want = max_pool_2x(x)
        got = folding.pool_consume_fold(folding.fold2(x))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(
            np.asarray(folding.pool_refold(folding.fold2(x))),
            np.asarray(folding.fold2(want)),
        )

    def test_upsample2x_folded(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 6, 4, 7)), jnp.float32)
        want = folding.fold2(upsample2x(x, spatial_axes=(1, 2, 3)))
        got = folding.upsample2x_folded(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_conv1x1_folded(self, rng):
        B, G, C, Co = 2, 4, 6, 3
        xf = jnp.asarray(rng.normal(size=(B, G, G, G, 8 * C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(1, 1, 1, C, Co)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(Co,)), jnp.float32)
        want = _conv3_same(folding.unfold2(xf), jnp.pad(w, [(1, 1)] * 3 + [(0, 0)] * 2), b)
        got = folding.unfold2(folding.conv1x1_folded(xf, w, b))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


class TestFoldedModel:
    def _models(self, **kw):
        m_ref = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2, **kw)
        m_fold = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                                layout="folded", **kw)
        params, state = m_ref.init(jax.random.key(11))
        return m_ref, m_fold, params, state

    def test_matches_unfolded_eval(self, rng):
        m_ref, m_fold, params, state = self._models()
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 16, 1)), jnp.float32)
        (sdf_a, seg_a, feat_a), _ = m_ref.apply(params, state, x)
        (sdf_b, seg_b, feat_b), _ = m_fold.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a), atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(sdf_b), np.asarray(sdf_a), atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(feat_b), np.asarray(feat_a), atol=1e-3, rtol=1e-3)

    def test_seg_only_path(self, rng):
        m_ref, m_fold, params, state = self._models()
        x = jnp.asarray(rng.normal(size=(1, 16, 32, 16, 1)), jnp.float32)
        (_, seg_a, _), _ = m_ref.apply(params, state, x, with_projection=False)
        (_, seg_b, none_feat), _ = m_fold.apply(params, state, x, with_projection=False)
        assert none_feat is None
        # atol 1e-3: eight stacked conv+IN layers amplify f32 reassociation
        # differences between the folded and plain reduction orders
        np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a), atol=1e-3, rtol=1e-3)

    def test_grads_match_unfolded(self, rng):
        """The folded path serves training: parameter gradients of a seg
        loss must match the unfolded model's."""
        m_ref, m_fold, params, state = self._models()
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, size=(1, 16, 16, 16)), jnp.int32)

        def loss(model):
            def f(p):
                (_, seg, _), _ = model.apply(p, state, x, with_projection=False)
                lp = jax.nn.log_softmax(seg, axis=-1)
                return -jnp.mean(jnp.take_along_axis(lp, y[..., None], axis=-1))
            return f

        g_ref = jax.grad(loss(m_ref))(params)
        g_fold = jax.grad(loss(m_fold))(params)
        flat_r = np.asarray(jax.flatten_util.ravel_pytree(g_ref)[0])
        flat_f = np.asarray(jax.flatten_util.ravel_pytree(g_fold)[0])
        # elementwise: loose atol — the one-pass IN variance reassociates
        # f32 sums, which shows up as ~1e-4 noise on near-zero gradients
        np.testing.assert_allclose(flat_f, flat_r, atol=2e-4, rtol=1e-2)
        # global: direction must agree to float precision
        cos = flat_f @ flat_r / (np.linalg.norm(flat_f) * np.linalg.norm(flat_r))
        assert cos > 1 - 1e-5, cos

    def test_train_mode_with_projection(self, rng):
        m_ref, m_fold, params, state = self._models()
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        (sdf, seg, feat), new_state = m_fold.apply(
            params, state, x, train=True, rng=jax.random.key(3)
        )
        assert bool(jnp.isfinite(seg).all()) and bool(jnp.isfinite(feat).all())
        assert not np.allclose(np.asarray(state["projection"]["bn1"]["mean"]),
                               np.asarray(new_state["projection"]["bn1"]["mean"]))

    def test_aspp_variant(self, rng):
        m_ref, m_fold, params, state = self._models(use_aspp=True)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        (_, seg_a, feat_a), _ = m_ref.apply(params, state, x)
        (_, seg_b, feat_b), _ = m_fold.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(feat_b), np.asarray(feat_a), atol=2e-4, rtol=1e-3)
