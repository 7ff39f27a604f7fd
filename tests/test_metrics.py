"""Metric tests: surface metrics against brute-force distance computation
and analytic cases; device metrics against numpy."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from dycon_paper_replication_tpu.ops import metrics


def _brute_surface_distances(a, b):
    """O(n^2) reference: distances from every surface voxel of a to the
    nearest surface voxel of b, surfaces via connectivity-1 erosion."""
    st = ndimage.generate_binary_structure(3, 1)
    sa = a & ~ndimage.binary_erosion(a, st, border_value=0)
    sb = b & ~ndimage.binary_erosion(b, st, border_value=0)
    pa = np.argwhere(sa).astype(float)
    pb = np.argwhere(sb).astype(float)
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


def _random_blobs(rng, shape=(16, 16, 16)):
    a = np.zeros(shape, bool)
    b = np.zeros(shape, bool)
    a[3:9, 4:10, 5:11] = True
    b[5:12, 6:12, 4:9] = True
    # add noise voxels
    a |= rng.uniform(size=shape) > 0.98
    b |= rng.uniform(size=shape) > 0.98
    return a, b


class TestSurfaceMetrics:
    def test_hd95_matches_bruteforce(self, rng):
        a, b = _random_blobs(rng)
        d1 = _brute_surface_distances(a, b)
        d2 = _brute_surface_distances(b, a)
        # medpy convention: percentile over the CONCATENATED distance sets
        want = np.percentile(np.hstack((d1, d2)), 95)
        assert np.isclose(metrics.hd95(a, b), want, atol=1e-6)

    def test_asd_matches_bruteforce(self, rng):
        a, b = _random_blobs(rng)
        want = _brute_surface_distances(a, b).mean()
        assert np.isclose(metrics.asd(a, b), want, atol=1e-6)

    def test_identical_masks_zero_distance(self):
        a = np.zeros((10, 10, 10), bool)
        a[2:7, 2:7, 2:7] = True
        assert metrics.hd95(a, a) == 0.0
        assert metrics.asd(a, a) == 0.0

    def test_shifted_cube(self):
        a = np.zeros((20, 20, 20), bool)
        b = np.zeros((20, 20, 20), bool)
        a[5:10, 5:10, 5:10] = True
        b[8:13, 5:10, 5:10] = True  # shifted 3 along axis 0
        assert metrics.hd95(a, b) <= 3.0 + 1e-6
        assert metrics.asd(a, b) > 0

    def test_empty_gt_guard(self):
        pred = np.zeros((8, 8, 8), bool)
        pred[2:4, 2:4, 2:4] = True
        d, j, h, a = metrics.calculate_metric_percase(pred, np.zeros((8, 8, 8), bool))
        assert (d, j, h, a) == (0.0, 0.0, 0.0, 0.0)


class TestOverlapMetrics:
    def test_dice_jaccard(self, rng):
        a = rng.uniform(size=(12, 12, 12)) > 0.5
        b = rng.uniform(size=(12, 12, 12)) > 0.5
        inter = (a & b).sum()
        want_d = 2 * inter / (a.sum() + b.sum())
        want_j = inter / (a | b).sum()
        assert np.isclose(metrics.dice(a, b), want_d)
        assert np.isclose(metrics.jaccard(a, b), want_j)

    def test_batch_versions_match_host(self, rng):
        a = (rng.uniform(size=(3, 8, 8, 8)) > 0.5).astype(np.float32)
        b = (rng.uniform(size=(3, 8, 8, 8)) > 0.5).astype(np.float32)
        bd = np.asarray(metrics.batch_dice(jnp.asarray(a), jnp.asarray(b)))
        bj = np.asarray(metrics.batch_jaccard(jnp.asarray(a), jnp.asarray(b)))
        for i in range(3):
            assert np.isclose(bd[i], metrics.dice(a[i] > 0, b[i] > 0), atol=1e-5)
            assert np.isclose(bj[i], metrics.jaccard(a[i] > 0, b[i] > 0), atol=1e-5)

    def test_sensitivity_specificity(self):
        pred = np.array([[1, 1, 0, 0]], bool)
        gt = np.array([[1, 0, 1, 0]], bool)
        assert metrics.sensitivity(pred, gt) == 0.5
        assert metrics.specificity(pred, gt) == 0.5


class TestLargestCC:
    def test_keeps_largest(self):
        seg = np.zeros((16, 16, 16), int)
        seg[1:3, 1:3, 1:3] = 1  # 8 voxels
        seg[8:14, 8:14, 8:14] = 1  # 216 voxels
        out = metrics.largest_connected_component(seg)
        assert out[10, 10, 10] and not out[1, 1, 1]

    def test_diagonal_26_connectivity(self):
        # two voxels touching only at a corner are ONE component under the
        # 26-connectivity convention (skimage default the reference used)
        seg = np.zeros((4, 4, 4), int)
        seg[0, 0, 0] = 1
        seg[1, 1, 1] = 1
        seg[3, 3, 3] = 0
        out = metrics.largest_connected_component(seg)
        assert out[0, 0, 0] and out[1, 1, 1]

    def test_empty_passthrough(self):
        seg = np.zeros((4, 4, 4), int)
        out = metrics.largest_connected_component(seg)
        assert np.asarray(out).sum() == 0


class TestSDF:
    def test_sign_convention_and_range(self):
        from dycon_paper_replication_tpu.ops.sdf import compute_sdf
        seg = np.zeros((1, 16, 16, 16), np.uint8)
        seg[0, 4:12, 4:12, 4:12] = 1
        sdf = compute_sdf(seg)
        assert sdf.shape == seg.shape
        assert sdf[0, 0, 0, 0] > 0        # far outside: positive
        assert sdf[0, 8, 8, 8] < 0        # deep inside: negative
        assert abs(float(sdf[0, 4, 8, 8])) < 1e-6  # boundary voxel: 0
        assert sdf.min() >= -1.0 and sdf.max() <= 1.0

    def test_empty_mask_is_zero(self):
        from dycon_paper_replication_tpu.ops.sdf import compute_sdf
        sdf = compute_sdf(np.zeros((2, 8, 8, 8)))
        assert (sdf == 0).all()
