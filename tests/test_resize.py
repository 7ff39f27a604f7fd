"""Parity tests for resize/pool primitives against torch semantics."""

import numpy as np
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from dycon_paper_replication_tpu.ops import resize


def _ndhwc(x_torch):
    return jnp.asarray(np.moveaxis(x_torch.numpy(), 1, -1))


def _nchw(y_jax):
    return np.moveaxis(np.asarray(y_jax), -1, 1)


class TestTrilinear:
    def test_upsample2x_matches_torch_default(self, rng):
        x = torch.tensor(rng.normal(size=(2, 3, 4, 6, 5)).astype(np.float32))
        want = TF.interpolate(x, scale_factor=2, mode="trilinear", align_corners=False).numpy()
        got = _nchw(resize.upsample2x(_ndhwc(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_align_corners_true(self, rng):
        x = torch.tensor(rng.normal(size=(2, 3, 4, 4, 3)).astype(np.float32))
        want = TF.interpolate(x, scale_factor=2, mode="trilinear", align_corners=True).numpy()
        got = _nchw(resize.trilinear_resize(_ndhwc(x), (8, 8, 6), align_corners=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_arbitrary_size_align_corners_true(self, rng):
        x = torch.tensor(rng.normal(size=(1, 2, 5, 7, 3)).astype(np.float32))
        want = TF.interpolate(x, size=(10, 21, 12), mode="trilinear", align_corners=True).numpy()
        got = _nchw(resize.trilinear_resize(_ndhwc(x), (10, 21, 12), align_corners=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_downsample_align_corners_false(self, rng):
        x = torch.tensor(rng.normal(size=(1, 2, 8, 8, 8)).astype(np.float32))
        want = TF.interpolate(x, size=(4, 4, 4), mode="trilinear", align_corners=False).numpy()
        got = _nchw(resize.trilinear_resize(_ndhwc(x), (4, 4, 4), align_corners=False))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPool:
    def test_max_pool_2x(self, rng):
        x = torch.tensor(rng.normal(size=(2, 3, 8, 6, 4)).astype(np.float32))
        want = TF.max_pool3d(x, 2).numpy()
        got = _nchw(resize.max_pool_2x(_ndhwc(x)))
        np.testing.assert_allclose(got, want)

    def test_avg_pool_mask(self, rng):
        """The contrastive-mask downsampler: avg_pool3d(label, k=s) > 0.5."""
        lab = torch.tensor(rng.integers(0, 2, size=(2, 16, 16, 8)).astype(np.float32))
        want = TF.avg_pool3d(lab, kernel_size=8, stride=8).numpy()
        got = np.asarray(resize.avg_pool_nonoverlap(jnp.asarray(lab.numpy()), (8, 8, 8)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_avg_pool_anisotropic(self, rng):
        lab = torch.tensor(rng.uniform(size=(1, 12, 8, 4)).astype(np.float32))
        want = TF.avg_pool3d(lab, kernel_size=(4, 2, 2), stride=(4, 2, 2)).numpy()
        got = np.asarray(resize.avg_pool_nonoverlap(jnp.asarray(lab.numpy()), (4, 2, 2)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPad:
    def test_pad_to_shape(self):
        x = jnp.ones((1, 5, 8, 3, 2))
        y = resize.pad_to_shape(x, (8, 8, 8))
        assert y.shape == (1, 8, 8, 8, 2)
        # centered: floor on the leading side
        assert float(y[0, 0, 0, 2, 0]) == 0.0 and float(y[0, 1, 0, 2, 0]) == 1.0


class TestUpsample2xClosedForm:
    def test_matches_general_lerp(self, rng):
        """The shift-based 2x path must equal the general gather lerp."""
        import jax.numpy as jnp
        from dycon_paper_replication_tpu.ops.resize import trilinear_resize, upsample2x
        x = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)), jnp.float32)
        want = trilinear_resize(x, (10, 12, 14), align_corners=False)
        got = upsample2x(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_ncdhw_axes(self, rng):
        import jax.numpy as jnp
        from dycon_paper_replication_tpu.ops.resize import trilinear_resize, upsample2x
        x = jnp.asarray(rng.normal(size=(1, 3, 5, 6, 7)), jnp.float32)
        want = trilinear_resize(x, (10, 12, 14), align_corners=False, spatial_axes=(2, 3, 4))
        got = upsample2x(x, spatial_axes=(2, 3, 4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
