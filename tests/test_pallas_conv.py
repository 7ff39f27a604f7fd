"""Packed-lane Pallas conv kernel tests (interpret mode on CPU).

Validates the banded-matmul formulation against the XLA conv at
bf16-accumulation tolerance, across the channel/packing combinations
the UNet3D body uses, plus the model-level routing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dycon_paper_replication_tpu.models import layers, net_factory_3d
from dycon_paper_replication_tpu.ops.pallas_conv import (
    choose_pack,
    pack_weights,
    packed_conv3d,
)


class TestChoosePack:
    def test_unet_shapes(self):
        assert choose_pack(16, 96) == 8
        assert choose_pack(32, 48) == 4
        assert choose_pack(48, 96) == 8
        assert choose_pack(64, 24) == 2
        assert choose_pack(96, 48) == 4
        assert choose_pack(128, 12) == 1
        assert choose_pack(192, 24) == 2
        assert choose_pack(256, 6) == 1

    def test_no_packing_for_stem(self):
        assert choose_pack(1, 96) is None  # 1-channel stem stays on XLA

    def test_width_divisibility(self):
        assert choose_pack(16, 10) is None  # 8 does not divide 10


class TestPackedConv:
    @pytest.mark.parametrize(
        "shape,cin,cout",
        [
            ((2, 8, 8, 8), 16, 16),
            ((2, 8, 8, 8), 32, 32),
            ((1, 8, 8, 8), 48, 16),
            ((1, 4, 4, 4), 128, 128),
            ((1, 6, 6, 6), 256, 256),
        ],
    )
    def test_matches_xla(self, rng, shape, cin, cout):
        p = choose_pack(cin, shape[3])
        x = jnp.asarray(rng.standard_normal(shape + (cin,)).astype(np.float32))
        params = layers.conv3d_init(jax.random.key(1), cin, cout)
        want = layers.conv3d(params, x, compute_dtype=jnp.bfloat16).astype(jnp.float32)
        got = packed_conv3d(x, params["w"], params["b"], p=p,
                            out_dtype=jnp.float32, interpret=True)
        # `want` is additionally rounded to bf16 at the conv output (XLA
        # path in reduced precision), so allow ~2 bf16 ulps of headroom
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1.6e-2 * scale, rtol=0)

    def test_nonbatched_pack_weights_shapes(self):
        w = jnp.zeros((3, 3, 3, 16, 32))
        wm, wl, wh = pack_weights(w, 8)
        assert wm.shape == (9, 128, 256)
        assert wl.shape == (9, 16, 256)
        assert wh.shape == (9, 16, 256)


class TestModelRouting:
    def test_pallas_model_matches_xla_model(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 16, 1)).astype(np.float32))
        m_x = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                             compute_dtype=jnp.bfloat16)
        params, state = m_x.init(jax.random.key(0))
        m_p = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                             compute_dtype=jnp.bfloat16, conv_impl="pallas",
                             pallas_interpret=True)
        (_, seg_x, _), _ = m_x.apply(params, state, x, with_projection=False)
        (_, seg_p, _), _ = m_p.apply(params, state, x, with_projection=False)
        # 18 bf16-rounded convs + IN chains accumulate rounding walk; the
        # guarantee that matters is prediction agreement
        agree = np.mean(
            np.argmax(np.asarray(seg_p), -1) == np.argmax(np.asarray(seg_x), -1)
        )
        # random weights + noise input put logits near zero, so argmax is
        # maximally rounding-sensitive; trained logits separate far more
        assert agree > 0.98, agree
        np.testing.assert_allclose(np.asarray(seg_p), np.asarray(seg_x),
                                   atol=0.5, rtol=0.1)
