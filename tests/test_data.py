"""Data-layer tests: transforms, samplers, datasets (on synthetic h5
fixtures), windowed-read equivalence, and the prefetching loader."""

import numpy as np
import pytest

from dycon_paper_replication_tpu.data import (
    BraTS2019,
    BatchLoader,
    Compose,
    ISLESDataset,
    Pancreas,
    RandomCrop,
    RandomNoise,
    RandomRotFlip,
    SagittalToAxial,
    ToArray,
    TwoStreamBatchSampler,
)
from dycon_paper_replication_tpu.data import synthetic


@pytest.fixture(scope="module")
def data_roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.make_brats19(str(root / "BraTS2019"), n_train=6, n_test=2, shape=(48, 48, 32))
    synthetic.make_pancreas(str(root / "Pancreas"), n_train=6, n_test=2, shape=(56, 56, 40))
    synthetic.make_isles22(str(root / "ISLES22"), n_train=6, n_val=2, shape=(48, 48, 32))
    return root


class TestTransforms:
    def test_random_crop_shape_and_determinism(self, rng):
        sample = {"image": rng.normal(size=(40, 40, 30)), "label": rng.integers(0, 2, (40, 40, 30)).astype(np.uint8)}
        crop = RandomCrop((16, 16, 12))
        out1 = crop(dict(sample), np.random.default_rng(7))
        out2 = crop(dict(sample), np.random.default_rng(7))
        assert out1["image"].shape == (16, 16, 12)
        np.testing.assert_array_equal(out1["image"], out2["image"])

    def test_random_crop_pads_small_volumes(self, rng):
        sample = {"image": rng.normal(size=(10, 40, 30)), "label": rng.integers(0, 2, (10, 40, 30)).astype(np.uint8)}
        out = RandomCrop((16, 16, 12))(sample, np.random.default_rng(0))
        assert out["image"].shape == (16, 16, 12)

    def test_rotflip_preserves_alignment(self, rng):
        image = rng.normal(size=(12, 12, 8))
        label = (image > 0.5).astype(np.uint8)
        out = RandomRotFlip()({"image": image, "label": label}, np.random.default_rng(3))
        np.testing.assert_array_equal(out["label"], (out["image"] > 0.5).astype(np.uint8))

    def test_noise_bounded(self, rng):
        image = np.zeros((8, 8, 8))
        out = RandomNoise(sigma=0.1)({"image": image, "label": image}, np.random.default_rng(0))
        assert np.abs(out["image"]).max() <= 0.2 + 1e-12

    def test_sagittal_to_axial(self):
        image = np.arange(24.0).reshape(2, 3, 4)
        out = SagittalToAxial()({"image": image, "label": image.copy()}, np.random.default_rng(0))
        assert out["image"].shape == (4, 3, 2)
        np.testing.assert_array_equal(out["image"], np.transpose(image, (2, 1, 0)))

    def test_to_array_layout(self, rng):
        image = rng.normal(size=(8, 8, 6))
        label = rng.integers(0, 2, (8, 8, 6))
        out = ToArray()({"image": image, "label": label}, np.random.default_rng(0))
        assert out["image"].shape == (8, 8, 6, 1) and out["image"].dtype == np.float32
        assert out["label"].shape == (8, 8, 6) and out["label"].dtype == np.int32


class TestSampler:
    def test_batch_layout_contract(self):
        s = TwoStreamBatchSampler(range(4), range(4, 20), batch_size=6, secondary_batch_size=3, seed=0)
        assert len(s) == 1
        for batch in s:
            assert len(batch) == 6
            assert all(i < 4 for i in batch[:3])  # labeled occupy batch[:labeled_bs]
            assert all(i >= 4 for i in batch[3:])

    def test_epoch_covers_primary_once(self):
        s = TwoStreamBatchSampler(range(8), range(8, 20), batch_size=4, secondary_batch_size=2, seed=1)
        seen = [i for batch in s for i in batch[:2]]
        assert sorted(seen) == list(range(8))


class TestDatasets:
    def test_brats_axial_view(self, data_roots):
        ds = BraTS2019(str(data_roots / "BraTS2019"), split="train")
        sample = ds.get(0, np.random.default_rng(0))
        assert sample["image"].shape == (32, 48, 48)  # transposed (2,1,0)

    def test_windowed_crop_equals_full_read_crop(self, data_roots):
        """The chunked-read fast path must equal pad+RandomCrop bit-for-bit."""
        for ds_fast, ds_full in [
            (
                Pancreas(str(data_roots / "Pancreas"), crop_size=(32, 32, 24),
                         transform=Compose([ToArray()])),
                Pancreas(str(data_roots / "Pancreas"),
                         transform=Compose([RandomCrop((32, 32, 24)), ToArray()])),
            ),
            (
                BraTS2019(str(data_roots / "BraTS2019"), crop_size=(24, 24, 24),
                          transform=Compose([ToArray()])),
                BraTS2019(str(data_roots / "BraTS2019"),
                          transform=Compose([RandomCrop((24, 24, 24)), ToArray()])),
            ),
        ]:
            a = ds_fast.get(1, np.random.default_rng(42))
            b = ds_full.get(1, np.random.default_rng(42))
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])

    def test_windowed_crop_small_volume_falls_back(self, data_roots):
        ds = Pancreas(str(data_roots / "Pancreas"), crop_size=(64, 64, 64),
                      transform=Compose([ToArray()]))
        sample = ds.get(0, np.random.default_rng(0))
        assert sample["image"].shape == (64, 64, 64, 1)

    def test_isles_mask_key(self, data_roots):
        ds = ISLESDataset(str(data_roots / "ISLES22"), split="train")
        sample = ds.get(0, np.random.default_rng(0))
        assert set(np.unique(sample["label"])) <= {0, 1}


class TestBatchLoader:
    def test_batches_and_determinism(self, data_roots):
        ds = Pancreas(str(data_roots / "Pancreas"), crop_size=(32, 32, 24),
                      transform=Compose([RandomRotFlip(), ToArray()]))
        sampler = TwoStreamBatchSampler(range(2), range(2, 6), 4, 2, seed=5)
        loader1 = BatchLoader(ds, sampler, seed=9)
        batches1 = list(loader1.epoch())
        sampler2 = TwoStreamBatchSampler(range(2), range(2, 6), 4, 2, seed=5)
        loader2 = BatchLoader(ds, sampler2, seed=9)
        batches2 = list(loader2.epoch())
        assert len(batches1) == 1
        assert batches1[0]["image"].shape == (4, 32, 32, 24, 1)
        assert batches1[0]["label"].dtype == np.int32
        np.testing.assert_array_equal(batches1[0]["image"], batches2[0]["image"])

    def test_epochs_stream_matches_epoch_loop(self, data_roots):
        """The continuous cross-epoch producer must yield the SAME
        batches and epoch indices as calling epoch() per epoch (RNG
        streams are keyed by (seed, epoch, batch), not by thread
        timing)."""
        ds = Pancreas(str(data_roots / "Pancreas"), crop_size=(32, 32, 24),
                      transform=Compose([RandomRotFlip(), ToArray()]))

        def mk():
            return BatchLoader(
                ds, TwoStreamBatchSampler(range(2), range(2, 6), 4, 2, seed=5), seed=9
            )

        loader_a = mk()
        want = [(e, b) for e in range(3) for b in loader_a.epoch()]
        got = list(mk().epochs(3))
        assert [e for e, _ in got] == [e for e, _ in want]
        for (_, ga), (_, wa) in zip(got, want):
            np.testing.assert_array_equal(ga["image"], wa["image"])
            np.testing.assert_array_equal(ga["label"], wa["label"])

    def test_epochs_stream_early_break_stops_producer(self, data_roots):
        ds = Pancreas(str(data_roots / "Pancreas"), crop_size=(32, 32, 24),
                      transform=Compose([ToArray()]))
        loader = BatchLoader(
            ds, TwoStreamBatchSampler(range(2), range(2, 6), 4, 2, seed=5), seed=9
        )
        for i, (_e, _b) in enumerate(loader.epochs()):
            if i == 2:
                break  # generator close must unblock the worker thread


class TestRemainingTransforms:
    def test_center_crop(self, rng):
        from dycon_paper_replication_tpu.data.transforms import CenterCrop
        img = rng.normal(size=(20, 18, 16)).astype(np.float32)
        lab = rng.integers(0, 2, size=(20, 18, 16)).astype(np.uint8)
        out = CenterCrop((8, 8, 8))({"image": img, "label": lab}, rng)
        assert out["image"].shape == (8, 8, 8)
        # centered: offset (20-8)//2=6, (18-8)//2=5, (16-8)//2=4
        np.testing.assert_array_equal(out["image"], img[6:14, 5:13, 4:12])
        np.testing.assert_array_equal(out["label"], lab[6:14, 5:13, 4:12])

    def test_resize_shapes_and_label_integrality(self, rng):
        from dycon_paper_replication_tpu.data.transforms import Resize
        img = rng.uniform(size=(20, 18, 16)).astype(np.float32)
        lab = (rng.uniform(size=(20, 18, 16)) > 0.7).astype(np.uint8)
        out = Resize((10, 10, 8))({"image": img, "label": lab}, rng)
        assert out["image"].shape == (10, 10, 8)
        assert out["label"].shape == (10, 10, 8)
        assert set(np.unique(out["label"])) <= {0, 1}

    def test_create_onehot(self, rng):
        from dycon_paper_replication_tpu.data.transforms import CreateOnehotLabel
        lab = rng.integers(0, 3, size=(6, 6, 4)).astype(np.uint8)
        out = CreateOnehotLabel(3)({"image": np.zeros((6, 6, 4), np.float32), "label": lab}, rng)
        oh = out["onehot_label"]
        assert oh.shape == (3, 6, 6, 4)
        np.testing.assert_array_equal(np.argmax(oh, axis=0), lab)
        np.testing.assert_array_equal(oh.sum(axis=0), np.ones_like(lab))
