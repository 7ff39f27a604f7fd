"""Sliding-window engine tests: origin grid semantics, stitching
equivalence against a straightforward per-patch numpy loop, padding
round-trip, and bucketing invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dycon_paper_replication_tpu.eval.sliding_window import (
    SlidingWindowInference,
    compute_origins,
)
from dycon_paper_replication_tpu.models import net_factory_3d


class TestOrigins:
    def test_grid_matches_reference_rule(self):
        # ww=48, patch=32, stride=8 -> xs = min(8x, 16) for x in 0..ceil(16/8)+1
        o = compute_origins((48, 48, 40), (32, 32, 32), 8, 4)
        xs = sorted({int(a) for a in o[:, 0]})
        assert xs == [0, 8, 16]
        zs = sorted({int(a) for a in o[:, 2]})
        assert zs == [0, 4, 8]

    def test_small_volume_single_origin(self):
        o = compute_origins((32, 32, 32), (32, 32, 32), 8, 4)
        assert o.shape == (1, 3)
        assert (o == 0).all()


@pytest.fixture(scope="module")
def sw_bundle():
    model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
    params, state = model.init(jax.random.key(0))
    return model, params, state


class TestStitching:
    def test_matches_naive_patch_loop(self, sw_bundle, rng):
        model, params, state = sw_bundle
        patch = (16, 16, 16)
        image = rng.normal(size=(24, 20, 16)).astype(np.float32)
        sw = SlidingWindowInference(model, patch, stride_xy=8, stride_z=8, patch_batch=2)
        label_map, score = sw(params, state, image)

        # naive reference loop (same origin rule, one patch per forward)
        origins = compute_origins(image.shape, patch, 8, 8)
        acc = np.zeros(image.shape, np.float32)
        cnt = np.zeros(image.shape, np.float32)
        fwd = jax.jit(lambda x: model.apply(params, state, x, with_projection=False)[0][1])
        for o in origins:
            sl = tuple(slice(s, s + p) for s, p in zip(o, patch))
            logits = fwd(jnp.asarray(image[sl][None, ..., None]))
            prob = np.asarray(jax.nn.softmax(logits, axis=-1))[0, ..., 1]
            acc[sl] += prob
            cnt[sl] += 1
        want = acc / cnt
        np.testing.assert_allclose(score, want, atol=2e-5)
        np.testing.assert_array_equal(label_map, (want > 0.5).astype(int))

    def test_pad_small_volume_roundtrip(self, sw_bundle, rng):
        model, params, state = sw_bundle
        image = rng.normal(size=(10, 12, 8)).astype(np.float32)
        sw = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2)
        label_map, score = sw(params, state, image)
        assert label_map.shape == image.shape
        assert score.shape == image.shape

    def test_chunk_padding_is_average_preserving(self, sw_bundle, rng):
        """Regression: when the origin count doesn't divide patch_batch,
        the chunk padding must contribute ZERO weight. (Padding by
        repeating the last origin skews the overlap average wherever the
        repeated window overlaps other windows — 4 origins over a
        (24,20,16) volume all overlap.)"""
        model, params, state = sw_bundle
        patch = (16, 16, 16)
        image = rng.normal(size=(24, 20, 16)).astype(np.float32)
        # k=4 origins, patch_batch=3 -> k_bucket=6 with 2 padded entries
        sw = SlidingWindowInference(model, patch, 8, 8, patch_batch=3)
        _, score = sw(params, state, image)

        origins = compute_origins(image.shape, patch, 8, 8)
        acc = np.zeros(image.shape, np.float32)
        cnt = np.zeros(image.shape, np.float32)
        fwd = jax.jit(lambda x: model.apply(params, state, x, with_projection=False)[0][1])
        for o in origins:
            sl = tuple(slice(s, s + p) for s, p in zip(o, patch))
            logits = fwd(jnp.asarray(image[sl][None, ..., None]))
            acc[sl] += np.asarray(jax.nn.softmax(logits, axis=-1))[0, ..., 1]
            cnt[sl] += 1
        np.testing.assert_allclose(score, acc / cnt, atol=2e-5)

    def test_bucketing_invariance(self, sw_bundle, rng):
        """Different shape buckets must not change the result."""
        model, params, state = sw_bundle
        image = rng.normal(size=(20, 20, 16)).astype(np.float32)
        sw32 = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2, shape_bucket=32)
        sw4 = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=4, shape_bucket=4)
        _, s1 = sw32(params, state, image)
        _, s2 = sw4(params, state, image)
        np.testing.assert_allclose(s1, s2, atol=2e-5)


class TestFoldedPipeline:
    """The packed folded sliding-window program (fold volume once,
    folded gather/forward/scatter, unfold once) must reproduce the plain
    program bit-for-bit up to f32 reassociation."""

    @pytest.fixture(scope="class")
    def folded_bundle(self):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                               layout="folded")
        params, state = model.init(jax.random.key(0))
        return model, params, state

    def test_matches_plain_engine(self, sw_bundle, folded_bundle, rng):
        model_p, params, state = sw_bundle
        model_f, _, _ = folded_bundle
        image = rng.normal(size=(24, 20, 16)).astype(np.float32)
        sw_p = SlidingWindowInference(model_p, (16, 16, 16), 8, 8, patch_batch=2)
        sw_f = SlidingWindowInference(model_f, (16, 16, 16), 8, 8, patch_batch=2)
        label_p, score_p = sw_p(params, state, image)
        label_f, score_f = sw_f(params, state, image)
        assert any(k[3] for k in sw_f._compiled), "folded program not used"
        np.testing.assert_allclose(score_f, score_p, atol=5e-4, rtol=1e-4)
        # thresholded maps may differ only where score sits ON 0.5
        disagree = label_f != label_p
        assert np.abs(score_p[disagree] - 0.5).max(initial=0.0) < 5e-4

    def test_odd_origin_falls_back_to_plain(self, folded_bundle, rng):
        """Odd raw shapes produce odd clamped origins -> the folded model
        must transparently run the plain program and still be correct."""
        model_f, params, state = folded_bundle
        image = rng.normal(size=(21, 14, 16)).astype(np.float32)
        sw = SlidingWindowInference(model_f, (16, 16, 16), 8, 8, patch_batch=2,
                                    shape_bucket=8)
        label, score = sw(params, state, image)
        assert label.shape == image.shape
        assert not any(k[3] for k in sw._compiled), "expected plain fallback"
        assert bool(np.isfinite(score).all())


class TestGroupedMap:
    """`map(..., group=V)` packs V same-shape volumes into one device
    program (forward chunks fill across volume boundaries). Results must
    equal per-volume inference exactly, in input order, including tails
    and shape changes that flush a partial group."""

    def test_group_matches_singles(self, sw_bundle, rng):
        model, params, state = sw_bundle
        vols = [rng.normal(size=(24, 20, 16)).astype(np.float32) for _ in range(5)]
        sw = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=3)
        singles = [sw(params, state, v) for v in vols]
        # group=2 over 5 volumes: two full groups + a 1-volume tail
        grouped = list(
            sw.map(params, state, ((v, i) for i, v in enumerate(vols)),
                   return_score=True, group=2)
        )
        assert [g[2] for g in grouped] == [0, 1, 2, 3, 4]
        assert any(k[4] == 2 for k in sw._compiled), "no grouped program compiled"
        for (label_s, score_s), (label_g, score_g, _) in zip(singles, grouped):
            np.testing.assert_allclose(score_g, score_s, atol=2e-5)
            np.testing.assert_array_equal(label_g, label_s)

    def test_group_matches_singles_folded(self, rng):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                               layout="folded")
        params, state = model.init(jax.random.key(0))
        vols = [rng.normal(size=(24, 20, 16)).astype(np.float32) for _ in range(4)]
        sw = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=3)
        singles = [sw(params, state, v) for v in vols]
        grouped = list(sw.map(params, state, iter(vols), return_score=True, group=4))
        assert any(k[3] and k[4] == 4 for k in sw._compiled), "folded group program not used"
        for (label_s, score_s), (label_g, score_g) in zip(singles, grouped):
            np.testing.assert_allclose(score_g, score_s, atol=2e-5)
            np.testing.assert_array_equal(label_g, label_s)

    def test_shape_change_flushes_group(self, sw_bundle, rng):
        model, params, state = sw_bundle
        vols = [
            rng.normal(size=(24, 20, 16)).astype(np.float32),
            rng.normal(size=(20, 20, 16)).astype(np.float32),  # flush at 1
            rng.normal(size=(20, 20, 16)).astype(np.float32),
        ]
        sw = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2)
        singles = [sw(params, state, v) for v in vols]
        grouped = list(sw.map(params, state, iter(vols), return_score=True, group=2))
        assert len(grouped) == 3
        for (label_s, score_s), (label_g, score_g) in zip(singles, grouped):
            np.testing.assert_allclose(score_g, score_s, atol=2e-5)

    def test_host_pool_no_stale_margin_across_shapes(self, sw_bundle, rng):
        """Two distinct raw shapes can share a 32-quantized staging
        bucket; the pooled buffer must not leak the first (larger)
        volume's voxels into the second's alignment margin. Regression:
        the pool was originally keyed by bucket, not raw shape."""
        model, params, state = sw_bundle
        sw = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2)
        big = np.full((24, 24, 16), 50.0, np.float32)  # poisons any shared margin
        small = rng.normal(size=(17, 24, 16)).astype(np.float32)
        sw(params, state, big)
        _, score_after = sw(params, state, small)
        fresh = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2)
        _, score_fresh = fresh(params, state, small)
        np.testing.assert_allclose(score_after, score_fresh, atol=2e-5)


class TestMeshSharding:
    """Mesh mode shards patch chunks over the 'data' axis and psums the
    partial score/count maps — results must equal the single-device
    engine exactly (overlap-add is order-independent addition)."""

    def _mesh(self):
        from dycon_paper_replication_tpu.parallel.mesh import make_mesh

        return make_mesh()  # all 8 virtual CPU devices (conftest)

    def test_sharded_matches_single_device(self, sw_bundle, rng):
        model, params, state = sw_bundle
        image = rng.normal(size=(24, 20, 16)).astype(np.float32)
        sw1 = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2)
        swm = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2,
                                     mesh=self._mesh())
        _, s1 = sw1(params, state, image)
        _, sm = swm(params, state, image)
        np.testing.assert_allclose(sm, s1, atol=2e-5)

    def test_sharded_folded_matches(self, rng):
        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                               layout="folded")
        params, state = model.init(jax.random.key(0))
        image = rng.normal(size=(24, 20, 16)).astype(np.float32)
        sw1 = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2)
        swm = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2,
                                     mesh=self._mesh())
        _, s1 = sw1(params, state, image)
        _, sm = swm(params, state, image)
        assert any(k[3] for k in swm._compiled), "folded program not used in mesh mode"
        np.testing.assert_allclose(sm, s1, atol=2e-5)


class TestCompileCache:
    def test_shapes_share_bucketed_programs(self, sw_bundle, rng):
        """Different raw volume shapes that round to the same buckets must
        reuse ONE compiled program (recompilation is the dominant cost on
        real deployments)."""
        model, params, state = sw_bundle
        sw = SlidingWindowInference(model, (16, 16, 16), 8, 8, patch_batch=2, shape_bucket=8)
        for shape in ((17, 18, 16), (18, 17, 16), (19, 19, 16)):
            image = rng.normal(size=shape).astype(np.float32)
            label, _ = sw(params, state, image, return_score=False)
            assert label.shape == shape
        assert len(sw._compiled) == 1, list(sw._compiled)

    def test_odd_shape_correct_vs_naive(self, sw_bundle, rng):
        """Dynamic-offset placement must not shift the stitched result for
        volumes needing centered patch padding (odd, sub-patch axes)."""
        model, params, state = sw_bundle
        patch = (16, 16, 16)
        image = rng.normal(size=(21, 14, 16)).astype(np.float32)
        sw = SlidingWindowInference(model, patch, 8, 8, patch_batch=2, shape_bucket=8)
        label, score = sw(params, state, image)

        # naive: pad centered, patch loop, unpad
        pads = [(max(p - s, 0) // 2, max(p - s, 0) - max(p - s, 0) // 2)
                for s, p in zip(image.shape, patch)]
        padded = np.pad(image, pads)
        origins = compute_origins(padded.shape, patch, 8, 8)
        acc = np.zeros(padded.shape, np.float32)
        cnt = np.zeros(padded.shape, np.float32)
        fwd = jax.jit(lambda x: model.apply(params, state, x, with_projection=False)[0][1])
        for o in origins:
            sl = tuple(slice(s, s + p) for s, p in zip(o, patch))
            logits = fwd(jnp.asarray(padded[sl][None, ..., None]))
            prob = np.asarray(jax.nn.softmax(logits, axis=-1))[0, ..., 1]
            acc[sl] += prob
            cnt[sl] += 1
        want = (acc / cnt)[tuple(slice(lo, lo + s) for (lo, _), s in zip(pads, image.shape))]
        np.testing.assert_allclose(score, want, atol=2e-5)
