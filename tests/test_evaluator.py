"""Evaluator driver tests with a stub inference engine: metric
aggregation, largest-CC post-processing, performance.txt artifact, and
the ISLES whole-volume edge-case rules (test_ISLES22.py:98-163)."""

import os

import numpy as np
import pytest

from dycon_paper_replication_tpu.eval import evaluator


class StubSW:
    """Stands in for SlidingWindowInference: returns canned predictions."""

    def __init__(self, preds):
        self.preds = list(preds)
        self.i = 0

    def __call__(self, params, state, image, return_score=True):
        p = self.preds[self.i]
        self.i += 1
        return p, None

    def map(self, params, state, volumes, *, return_score=False, group=1):
        for item in volumes:
            image, *rest = item if isinstance(item, tuple) else (item,)
            pred, score = self(params, state, image, return_score=return_score)
            yield (pred, score, *rest)


def _cube(shape, sl):
    m = np.zeros(shape, np.int64)
    m[sl] = 1
    return m


class TestVarAllCase:
    def test_mean_dice(self):
        shape = (16, 16, 16)
        gt = _cube(shape, np.s_[4:12, 4:12, 4:12])
        perfect = gt.copy()
        empty = np.zeros(shape, np.int64)
        sw = StubSW([perfect, empty])
        avg = evaluator.var_all_case(sw, None, None, [(gt, gt), (gt, gt)])
        assert avg == pytest.approx(0.5)  # 1.0 and (empty -> 0) averaged


class TestTestAllCase:
    def test_metrics_and_artifact(self, tmp_path):
        shape = (16, 16, 16)
        gt = _cube(shape, np.s_[4:12, 4:12, 4:12])
        # prediction with a spurious far-away blob that nms must remove
        noisy = gt.copy()
        noisy[0, 0, 0] = 1
        sw = StubSW([noisy])
        avg = evaluator.test_all_case(
            sw, None, None, [(gt, gt)], nms=True,
            test_save_path=str(tmp_path / "out"),
        )
        assert avg[0] == pytest.approx(1.0)  # dice perfect after largest-CC
        assert avg[2] == pytest.approx(0.0)  # hd95
        assert os.path.exists(tmp_path / "out" / "performance.txt")


class StubWV:
    def __init__(self, preds):
        self.preds = list(preds)
        self.i = 0

    def predict(self, params, state, image):
        p = self.preds[self.i]
        self.i += 1
        return p

    def map(self, params, state, volumes, depth=2, group=1):
        for image, label in volumes:
            yield self.predict(params, state, image), label


class TestWholeVolumeGrouping:
    """Batched (group>1) whole-volume inference must equal per-volume
    prediction exactly — InstanceNorm is per-sample and the BN projection
    head is skipped — and preserve input order through shape changes."""

    def test_group_matches_singles(self, rng):
        import jax

        from dycon_paper_replication_tpu.eval.evaluator import WholeVolumeInference
        from dycon_paper_replication_tpu.models import net_factory_3d

        model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
        params, state = model.init(jax.random.key(0))
        wv = WholeVolumeInference(model, (16, 16, 16))
        vols = [rng.normal(size=(16, 16, 16)).astype(np.float32) for _ in range(3)]
        vols.append(rng.normal(size=(16, 16, 32)).astype(np.float32))  # shape change
        labels = [np.zeros(v.shape, np.uint8) for v in vols]
        singles = [wv.predict(params, state, v) for v in vols]
        grouped = list(wv.map(params, state, zip(vols, labels), group=2))
        assert len(grouped) == len(vols)
        for want, (got, _) in zip(singles, grouped):
            np.testing.assert_array_equal(got, want)


class TestWholeVolumeEdgeCases:
    def test_both_empty_is_perfect(self):
        shape = (8, 8, 8)
        z = np.zeros(shape, np.int64)
        wv = StubWV([z])
        s = evaluator.test_all_case_wholevolume(wv, None, None, [(z, z)])
        assert s["dice"] == 1.0 and s["hd95"] == 0.0 and s["specificity"] == 1.0

    def test_one_empty_uses_max_dist(self):
        shape = (8, 8, 8)
        z = np.zeros(shape, np.int64)
        gt = _cube(shape, np.s_[2:5, 2:5, 2:5])
        wv = StubWV([z])
        s = evaluator.test_all_case_wholevolume(wv, None, None, [(gt, gt)])
        assert s["dice"] == 0.0
        assert s["hd95"] == pytest.approx(float(np.linalg.norm(shape)))
        assert s["sensitivity"] == 0.0 and s["specificity"] == 1.0

    def test_results_file(self, tmp_path):
        shape = (8, 8, 8)
        gt = _cube(shape, np.s_[2:5, 2:5, 2:5])
        wv = StubWV([gt])
        path = str(tmp_path / "res.txt")
        s = evaluator.test_all_case_wholevolume(wv, None, None, [(gt, gt)], results_path=path)
        assert s["dice"] == 1.0
        text = open(path).read()
        assert "DICE" in text and "Sample   0" in text
