"""Deterministic synthetic dataset fixtures.

The reference h5 schema is trivial: datasets `image` (float) and
`label`/`mask` (uint8) of one spatial shape per file, plus text split
lists. This module fabricates small but structurally faithful dataset
trees for all three dataset families so every pipeline/trainer/eval
path can be exercised hermetically (the reference has no fixtures at
all — SURVEY.md §4 names this the largest QA gap to close).

Volumes contain a random ellipsoid "lesion" so Dice/HD95 are non-trivial.
"""

from __future__ import annotations

import os

import h5py
import numpy as np


def _ellipsoid_volume(rng: np.random.Generator, shape) -> tuple[np.ndarray, np.ndarray]:
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
    center = [rng.uniform(0.3 * s, 0.7 * s) for s in shape]
    radii = [rng.uniform(0.1 * s, 0.25 * s) for s in shape]
    d = (
        ((zz - center[0]) / radii[0]) ** 2
        + ((yy - center[1]) / radii[1]) ** 2
        + ((xx - center[2]) / radii[2]) ** 2
    )
    label = (d <= 1.0).astype(np.uint8)
    image = 0.4 * label + 0.1 * rng.standard_normal(shape).astype(np.float32)
    image = (image - image.min()) / (image.max() - image.min() + 1e-8)
    # f32 storage matches the real preprocessors' output dtype
    # (data/preprocess.py writes f32 images)
    return image.astype(np.float32), label


def make_brats19(root: str, n_train: int = 8, n_test: int = 3, shape=(64, 64, 48), seed: int = 0):
    """BraTS-ish tree: {root}/{train,test,val}.txt + data/<case>.h5."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    names = {"train": [f"case_{i:03d}" for i in range(n_train)],
             "test": [f"case_t{i:03d}" for i in range(n_test)]}
    names["val"] = names["test"]
    for split in ("train", "test", "val"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names[split]) + "\n")
    for split in ("train", "test"):
        for name in names[split]:
            image, label = _ellipsoid_volume(rng, shape)
            with h5py.File(os.path.join(root, "data", f"{name}.h5"), "w") as f:
                f.create_dataset("image", data=image)
                f.create_dataset("label", data=label)
    return names


def make_pancreas(root: str, n_train: int = 8, n_test: int = 3, shape=(72, 72, 56), seed: int = 1):
    """Pancreas-ish tree: {root}/{train,test,test1}.list + Pancreas_data/."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "Pancreas_data"), exist_ok=True)
    train = [f"PANCREAS_{i:04d}.h5" for i in range(n_train)]
    test = [f"PANCREAS_t{i:04d}.h5" for i in range(n_test)]
    for fname, items in (("train.list", train), ("test.list", test), ("test1.list", test)):
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(items) + "\n")
    for name in train + test:
        image, label = _ellipsoid_volume(rng, shape)
        with h5py.File(os.path.join(root, "Pancreas_data", name), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=label)
    return train, test


def make_isles22(root: str, n_train: int = 8, n_val: int = 3, shape=(64, 64, 48), seed: int = 2):
    """ISLES-ish tree: {root}/{train,val}.list + <case>.h5 with `mask`."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    train = [f"sub-strokecase{i:04d}" for i in range(n_train)]
    val = [f"sub-strokecase9{i:03d}" for i in range(n_val)]
    for fname, items in (("train.list", train), ("val.list", val)):
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(items) + "\n")
    for name in train + val:
        image, label = _ellipsoid_volume(rng, shape)
        with h5py.File(os.path.join(root, f"{name}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("mask", data=label.astype(np.float64))
    return train, val
