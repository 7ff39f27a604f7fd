"""HDF5 volume datasets for BraTS-2019, Pancreas-CT and ISLES-2022.

Each dataset yields {'image', 'label'} numpy samples; `get(idx, rng)`
applies the transform pipeline with an explicit RNG.

TPU-pipeline redesign vs the reference (which reads the FULL volume per
sample then crops, dataloaders/brats19.py:38-46): when constructed with
`crop_size`, the dataset chooses the crop origin from the stored shape
and reads ONLY the crop window from HDF5 (h5py partial read), removing
the dominant IO amplification of patch training. The windowed path is
bit-equivalent to pad+RandomCrop (tests/test_data.py proves it). BraTS'
sagittal->axial transpose is folded into the window mapping.
"""

from __future__ import annotations

import os
from typing import Sequence

import h5py
import numpy as np

from .transforms import Compose, RandomCrop, _pad_margin


def _read_list(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip().split(",")[0] for line in f if line.strip()]


class H5VolumeDataset:
    """Base: a list of .h5 files with `image` and `label` (or `mask`)
    datasets of identical spatial shape."""

    label_key = "label"
    axial_transpose = False  # fold a (2,1,0) transpose into reads (BraTS)

    def __init__(
        self,
        paths: Sequence[str],
        transform: Compose | None = None,
        crop_size: tuple[int, int, int] | None = None,
    ):
        self.paths = list(paths)
        self.transform = transform
        self.crop_size = tuple(crop_size) if crop_size is not None else None
        self._shapes: dict[int, tuple[int, ...]] = {}

    def __len__(self) -> int:
        return len(self.paths)

    def shape(self, idx: int) -> tuple[int, ...]:
        if idx not in self._shapes:
            with h5py.File(self.paths[idx], "r") as f:
                s = tuple(f["image"].shape)
            self._shapes[idx] = s[::-1] if self.axial_transpose else s
        return self._shapes[idx]

    def _read(self, idx: int, window: tuple[slice, ...] | None = None) -> dict:
        if self.axial_transpose and window is not None:
            window = window[::-1]
        with h5py.File(self.paths[idx], "r") as f:
            if window is None:
                image = f["image"][:]
                label = f[self.label_key][:]
            else:
                image = f["image"][window]
                label = f[self.label_key][window]
        if self.axial_transpose:
            image = np.transpose(image, (2, 1, 0))
            label = np.transpose(label, (2, 1, 0))
        # convert once at the source: f64-stored volumes (some upstream
        # preprocessors) would otherwise double every downstream copy on
        # the host; np.asarray is a no-copy passthrough for f32 files
        return {"image": np.asarray(image, np.float32),
                "label": np.asarray(label, np.uint8)}

    def get(self, idx: int, rng: np.random.Generator | None = None) -> dict:
        rng = rng or np.random.default_rng()
        crop = self.crop_size
        if crop is not None:
            shape = self.shape(idx)
            needs_pad, _ = _pad_margin(shape, crop)
            if not needs_pad:
                # windowed fast path: draw the origin exactly like RandomCrop
                starts = RandomCrop(crop).origin(shape, rng)
                window = tuple(slice(s, s + o) for s, o in zip(starts, crop))
                sample = self._read(idx, window)
            else:
                # small volume: full read + pad-with-margin crop
                sample = RandomCrop(crop)(self._read(idx), rng)
        else:
            sample = self._read(idx)
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample

    # torch-Dataset-style convenience (module-level RNG)
    def __getitem__(self, idx: int) -> dict:
        return self.get(idx)


class BraTS2019(H5VolumeDataset):
    """BraTS-2019 whole-tumor volumes, presented in axial view.

    Layout: <base_dir>/{train,test}.txt case lists + data/<case>.h5.
    The reference applies a SagittalToAxial (2,1,0) transpose before
    cropping (train_DyCON_BraTS19.py:240-245); here the transpose is a
    property of the dataset's read path.
    """

    axial_transpose = True

    def __init__(self, base_dir, split="train", num=None, transform=None, crop_size=None):
        list_file = os.path.join(base_dir, "train.txt" if split == "train" else "test.txt")
        names = _read_list(list_file)
        if num is not None:
            names = names[:num]
        paths = [os.path.join(base_dir, "data", f"{n}.h5") for n in names]
        super().__init__(paths, transform, crop_size)


class Pancreas(H5VolumeDataset):
    """Pancreas-CT: <base_dir>/{train,test}.list of Pancreas_data/ h5 names."""

    def __init__(self, base_dir, split="train", num=None, transform=None, crop_size=None):
        list_file = os.path.join(base_dir, "train.list" if split == "train" else "test.list")
        names = _read_list(list_file)
        if num is not None:
            names = names[:num]
        paths = [os.path.join(base_dir, "Pancreas_data", n) for n in names]
        super().__init__(paths, transform, crop_size)


class ISLESDataset(H5VolumeDataset):
    """ISLES-2022 DWI stroke volumes: <h5_dir>/{split}.list of case ids,
    files <h5_dir>/<case>.h5 with datasets image + `mask`."""

    label_key = "mask"

    def __init__(self, h5_dir, split="train", transform=None, crop_size=None):
        list_file = os.path.join(h5_dir, f"{split}.list")
        if not os.path.exists(list_file):
            raise FileNotFoundError(f"List file {list_file} not found.")
        names = _read_list(list_file)
        paths = [os.path.join(h5_dir, f"{n}.h5") for n in names]
        self.missing = [p for p in paths if not os.path.exists(p)]
        super().__init__([p for p in paths if os.path.exists(p)], transform, crop_size)
