"""NIfTI reader + preprocessing pipeline tests (hermetic: fabricated
BraTS/ISLES trees of in-house-written .nii.gz files)."""

import gzip
import os
import struct

import h5py
import numpy as np
import pytest

from dycon_paper_replication_tpu.data import nifti
from dycon_paper_replication_tpu.data.preprocess import (
    BRATS_TARGET_SHAPE,
    ISLES_TARGET_SHAPE,
    create_isles_splits,
    normalize_image,
    preprocess_brats2019,
    preprocess_isles22,
    resample,
)


class TestNifti:
    @pytest.mark.parametrize("compress", [False, True])
    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32, np.float64])
    def test_roundtrip(self, tmp_path, rng, compress, dtype):
        data = (rng.uniform(0, 100, size=(9, 7, 5))).astype(dtype)
        path = str(tmp_path / ("x.nii.gz" if compress else "x.nii"))
        nifti.save(path, data, zooms=(1.0, 2.0, 3.0))
        img = nifti.load(path)
        assert img.shape == (9, 7, 5)
        assert img.zooms == (1.0, 2.0, 3.0)
        np.testing.assert_allclose(img.get_fdata(), data.astype(np.float64))

    def test_scl_slope_applied(self, tmp_path):
        data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
        path = str(tmp_path / "s.nii")
        nifti.save(path, data)
        # patch scl_slope=2.0, scl_inter=1.0 into the written header
        with open(path, "r+b") as f:
            f.seek(112)
            f.write(struct.pack("<ff", 2.0, 1.0))
        got = nifti.load(path).get_fdata()
        np.testing.assert_allclose(got, data * 2.0 + 1.0)

    def test_fortran_order(self, tmp_path):
        """First axis varies fastest on disk (NIfTI spec)."""
        data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        path = str(tmp_path / "f.nii")
        nifti.save(path, data)
        raw = open(path, "rb").read()
        on_disk = np.frombuffer(raw, np.float32, count=24, offset=352)
        np.testing.assert_array_equal(on_disk, data.flatten(order="F"))

    def test_rejects_garbage(self, tmp_path):
        path = str(tmp_path / "bad.nii")
        with open(path, "wb") as f:
            f.write(b"\x00" * 400)
        with pytest.raises(ValueError):
            nifti.load(path)


class TestNormalize:
    def test_range_and_zero_preservation(self, rng):
        img = np.where(rng.uniform(size=(10, 10, 10)) > 0.3,
                       rng.uniform(10, 50, size=(10, 10, 10)), 0.0)
        out = normalize_image(img)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert out.dtype == np.float32

    def test_all_zero_passthrough(self):
        img = np.zeros((4, 4, 4))
        np.testing.assert_array_equal(normalize_image(img), img)


class TestResample:
    def test_exact_target_shape(self, rng):
        img = rng.uniform(size=(37, 41, 23)).astype(np.float32)
        lab = (rng.uniform(size=(37, 41, 23)) > 0.8).astype(np.uint8)
        ir, lr = resample(img, lab, (19, 19, 13))
        assert ir.shape == (19, 19, 13) and lr.shape == (19, 19, 13)
        assert set(np.unique(lr)) <= {0, 1}


def _make_brats_tree(root, cases=("BraTS19_TCIA_001_1",)):
    for case in cases:
        d = os.path.join(root, "HGG", case)
        os.makedirs(d)
        rng = np.random.default_rng(hash(case) % 2**32)
        vol = rng.uniform(0, 800, size=(24, 24, 16)).astype(np.float32)
        seg = np.zeros((24, 24, 16), np.uint8)
        seg[8:14, 8:14, 4:10] = 2  # edema label -> binarized to 1
        nifti.save(os.path.join(d, f"{case}_t2.nii.gz"), vol)
        nifti.save(os.path.join(d, f"{case}_seg.nii.gz"), seg)


class TestBraTSPipeline:
    def test_end_to_end(self, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        _make_brats_tree(src)
        n = preprocess_brats2019(src, dst)
        assert n == 1
        with h5py.File(os.path.join(dst, "BraTS19_TCIA_001_1.h5")) as f:
            img, lab = f["image"][:], f["label"][:]
        assert img.shape == BRATS_TARGET_SHAPE and lab.shape == BRATS_TARGET_SHAPE
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert lab.sum() > 0 and set(np.unique(lab)) <= {0, 1}


def _make_isles_tree(root, n_cases=3):
    cases = [f"sub-strokecase{i:04d}" for i in range(1, n_cases + 1)]
    for case in cases:
        rng = np.random.default_rng(hash(case) % 2**32)
        dwi_dir = os.path.join(root, case, "ses-0001", "dwi")
        msk_dir = os.path.join(root, "derivatives", case, "ses-0001")
        os.makedirs(dwi_dir), os.makedirs(msk_dir)
        vol = rng.uniform(0, 500, size=(20, 20, 12)).astype(np.float32)
        msk = np.zeros((20, 20, 12), np.uint8)
        msk[5:9, 5:9, 3:7] = 1
        nifti.save(os.path.join(dwi_dir, f"{case}_ses-0001_dwi.nii.gz"), vol)
        nifti.save(os.path.join(msk_dir, f"{case}_ses-0001_msk.nii.gz"), msk)
    return cases


class TestISLESPipeline:
    def test_end_to_end_with_splits(self, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        cases = _make_isles_tree(src)
        n = preprocess_isles22(src, dst)
        assert n == len(cases)
        for case in cases:
            with h5py.File(os.path.join(dst, f"{case}.h5")) as f:
                assert f["image"].shape == ISLES_TARGET_SHAPE
                assert f["mask"].shape == ISLES_TARGET_SHAPE
        train = open(os.path.join(dst, "train.list")).read().split()
        val = open(os.path.join(dst, "val.list")).read().split()
        assert sorted(train + val) == sorted(cases)
        assert len(train) == int(len(cases) * 0.8)

    def test_split_deterministic(self, tmp_path):
        cases = [f"c{i}" for i in range(10)]
        t1, v1 = create_isles_splits(cases, str(tmp_path / "a"))
        t2, v2 = create_isles_splits(cases, str(tmp_path / "b"))
        assert t1 == t2 and v1 == v2
