"""Model structure tests: output shapes and parameter count goldens from
the reference printout (UNet3D_contrastive.py:337-343: 6.15M params,
out (4,2,128,128,80)-analog shapes, features upsampled by scale_factor)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dycon_paper_replication_tpu.models import net_factory_3d
from dycon_paper_replication_tpu.models.unet3d import param_count


class TestUNet3D:
    def test_shapes_and_param_count(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
        params, state = model.init(jax.random.key(0))
        x = jnp.zeros((2, 32, 32, 16, 1))
        (sdf, seg, feat), new_state = model.apply(params, state, x)
        assert sdf.shape == (2, 32, 32, 16, 2)
        assert seg.shape == (2, 32, 32, 16, 2)
        # bottleneck 32/16=2,32/16=2,16/16=1 -> x2 -> (4,4,2), 256ch
        assert feat.shape == (2, 4, 4, 2, 256)
        # reference golden: 6.15M params (printout rounds 6,146,%d to 6.15)
        n = param_count(params)
        assert abs(n / 1e6 - 6.15) < 0.005, n

    def test_scale_factor_4(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=4)
        params, state = model.init(jax.random.key(0))
        x = jnp.zeros((1, 32, 32, 32, 1))
        (_, _, feat), _ = model.apply(params, state, x)
        assert feat.shape == (1, 8, 8, 8, 256)

    def test_tanh_head_bounded_and_train_path(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
        params, state = model.init(jax.random.key(1))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 16, 1)), jnp.float32)
        (sdf, _, _), new_state = model.apply(params, state, x, train=True, rng=jax.random.key(2))
        assert float(jnp.max(jnp.abs(sdf))) <= 1.0
        # train-mode BN must update running stats
        old = state["projection"]["bn1"]["mean"]
        new = new_state["projection"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_eval_deterministic(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
        params, state = model.init(jax.random.key(1))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        (_, seg1, _), s1 = model.apply(params, state, x)
        (_, seg2, _), s2 = model.apply(params, state, x)
        np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg2))
        # eval mode must not touch BN state
        np.testing.assert_array_equal(
            np.asarray(s1["projection"]["bn1"]["mean"]),
            np.asarray(state["projection"]["bn1"]["mean"]),
        )

    def test_aspp_variant(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2, use_aspp=True)
        params, state = model.init(jax.random.key(0))
        x = jnp.zeros((2, 32, 32, 16, 1))
        (_, seg, feat), _ = model.apply(params, state, x)
        assert seg.shape == (2, 32, 32, 16, 2)
        assert feat.shape == (2, 4, 4, 2, 256)
