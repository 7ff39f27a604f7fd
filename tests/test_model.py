"""Model structure tests: output shapes and parameter count goldens from
the reference printout (UNet3D_contrastive.py:337-343: 6.15M params).
All forwards are jitted (one XLA compile each instead of per-op eager
compiles) and share one module-scoped model+params fixture."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dycon_paper_replication_tpu.models import net_factory_3d
from dycon_paper_replication_tpu.models.unet3d import param_count


@pytest.fixture(scope="module")
def model_bundle():
    model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
    params, state = model.init(jax.random.key(0))

    @partial(jax.jit, static_argnames=("train",))
    def fwd(params, state, x, rng=None, train=False):
        return model.apply(params, state, x, train=train, rng=rng)

    return model, params, state, fwd


class TestUNet3D:
    def test_shapes_and_param_count(self, model_bundle):
        model, params, state, fwd = model_bundle
        x = jnp.zeros((2, 32, 32, 16, 1))
        (sdf, seg, feat), new_state = fwd(params, state, x)
        assert sdf.shape == (2, 32, 32, 16, 2)
        assert seg.shape == (2, 32, 32, 16, 2)
        # bottleneck (2,2,1) -> x2 -> (4,4,2), 256ch projection output
        assert feat.shape == (2, 4, 4, 2, 256)
        # reference golden: 6.15M params
        n = param_count(params)
        assert abs(n / 1e6 - 6.15) < 0.005, n

    def test_train_path_updates_bn_and_bounds_tanh(self, model_bundle, rng):
        model, params, state, fwd = model_bundle
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 16, 1)), jnp.float32)
        (sdf, _, _), new_state = fwd(params, state, x, rng=jax.random.key(2), train=True)
        assert float(jnp.max(jnp.abs(sdf))) <= 1.0
        old = np.asarray(state["projection"]["bn1"]["mean"])
        new = np.asarray(new_state["projection"]["bn1"]["mean"])
        assert not np.allclose(old, new)

    def test_eval_deterministic_and_state_frozen(self, model_bundle, rng):
        model, params, state, fwd = model_bundle
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 16, 1)), jnp.float32)
        (_, seg1, _), s1 = fwd(params, state, x)
        (_, seg2, _), _ = fwd(params, state, x)
        np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg2))
        np.testing.assert_array_equal(
            np.asarray(s1["projection"]["bn1"]["mean"]),
            np.asarray(state["projection"]["bn1"]["mean"]),
        )

    def test_seg_only_inference_path(self, model_bundle, rng):
        """with_projection=False must produce identical seg logits."""
        model, params, state, _ = model_bundle
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 16, 1)), jnp.float32)

        @jax.jit
        def fwd_seg(params, state, x):
            return model.apply(params, state, x, with_projection=False)

        (_, seg_full, _), _ = jax.jit(lambda p, s, v: model.apply(p, s, v))(params, state, x)
        (_, seg_only, feat), _ = fwd_seg(params, state, x)
        assert feat is None
        np.testing.assert_allclose(np.asarray(seg_only), np.asarray(seg_full), atol=1e-6)


class TestVariants:
    def test_scale_factor_4(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=4)
        params, state = model.init(jax.random.key(0))
        x = jnp.zeros((1, 32, 32, 32, 1))
        (_, _, feat), _ = jax.jit(lambda p, s, v: model.apply(p, s, v))(params, state, x)
        assert feat.shape == (1, 8, 8, 8, 256)

    def test_aspp_variant(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2, use_aspp=True)
        params, state = model.init(jax.random.key(0))
        x = jnp.zeros((2, 32, 32, 16, 1))
        (_, seg, feat), _ = jax.jit(lambda p, s, v: model.apply(p, s, v))(params, state, x)
        assert seg.shape == (2, 32, 32, 16, 2)
        assert feat.shape == (2, 4, 4, 2, 256)


class TestVNet:
    def test_shapes_and_heads(self):
        model = net_factory_3d("vnet", in_chns=1, class_num=2, scaler=2)
        params, state = model.init(jax.random.key(0))
        x = jnp.zeros((2, 32, 32, 16, 1))
        (sdf, seg, feat), new_state = jax.jit(
            lambda p, s, v: model.apply(p, s, v)
        )(params, state, x)
        assert sdf.shape == (2, 32, 32, 16, 2)
        assert seg.shape == (2, 32, 32, 16, 2)
        # bottleneck (2,2,1) x scale_factor 2 -> (4,4,2), 256-ch projection
        assert feat.shape == (2, 4, 4, 2, 256)
        assert float(jnp.max(jnp.abs(sdf))) <= 1.0

    def test_train_mode_runs_with_dropout(self, rng):
        model = net_factory_3d("vnet", in_chns=1, class_num=2, scaler=2)
        params, state = model.init(jax.random.key(0))
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 16, 1)), jnp.float32)
        (_, seg, _), new_state = jax.jit(
            lambda p, s, v: model.apply(p, s, v, train=True, rng=jax.random.key(7))
        )(params, state, x)
        assert bool(jnp.isfinite(seg).all())
        # train-mode BN must update running stats somewhere in the encoder
        old = np.asarray(state["enc0"]["bn0"]["mean"])
        new = np.asarray(new_state["enc0"]["bn0"]["mean"])
        assert not np.allclose(old, new)


class TestLayoutParity:
    def test_ncdhw_matches_ndhwc(self, rng):
        """Channels-first internals must be numerically equivalent; only
        the device layout differs. Same params, same outputs."""
        m_cl = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
        params, state = m_cl.init(jax.random.key(4))
        m_cf = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2, layout="NCDHW")
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 16, 1)), jnp.float32)
        (sdf_a, seg_a, feat_a), _ = m_cl.apply(params, state, x)
        (sdf_b, seg_b, feat_b), _ = m_cf.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a), atol=5e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sdf_b), np.asarray(sdf_a), atol=5e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(feat_b), np.asarray(feat_a), atol=1e-4, rtol=1e-4)
        assert feat_b.shape == feat_a.shape  # channels-last externally

    def test_ncdhw_train_mode(self, rng):
        m_cf = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2, layout="NCDHW")
        params, state = m_cf.init(jax.random.key(4))
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 16, 1)), jnp.float32)
        (_, seg, feat), new_state = m_cf.apply(params, state, x, train=True, rng=jax.random.key(5))
        assert bool(jnp.isfinite(seg).all()) and bool(jnp.isfinite(feat).all())
        assert not np.allclose(np.asarray(state["projection"]["bn1"]["mean"]),
                               np.asarray(new_state["projection"]["bn1"]["mean"]))

    def test_vnet_ncdhw_matches_ndhwc(self, rng):
        m_cl = net_factory_3d("vnet", in_chns=1, class_num=2, scaler=2)
        params, state = m_cl.init(jax.random.key(6))
        m_cf = net_factory_3d("vnet", in_chns=1, class_num=2, scaler=2, layout="NCDHW")
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 16, 1)), jnp.float32)
        (sdf_a, seg_a, feat_a), _ = m_cl.apply(params, state, x)
        (sdf_b, seg_b, feat_b), _ = m_cf.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a), atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(feat_b), np.asarray(feat_a), atol=2e-4, rtol=1e-4)

    def test_aspp_under_ncdhw(self, rng):
        """ASPP stays channels-last internally; the NCDHW wrapper must
        transpose around it without changing results."""
        m_cl = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2, use_aspp=True)
        params, state = m_cl.init(jax.random.key(8))
        m_cf = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                              use_aspp=True, layout="NCDHW")
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 16, 1)), jnp.float32)
        (_, seg_a, feat_a), _ = m_cl.apply(params, state, x)
        (_, seg_b, feat_b), _ = m_cf.apply(params, state, x)
        np.testing.assert_allclose(np.asarray(seg_b), np.asarray(seg_a), atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(feat_b), np.asarray(feat_a), atol=2e-4, rtol=1e-3)
