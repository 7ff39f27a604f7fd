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
from scipy import ndimage


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


def _smooth_field(rng: np.random.Generator, shape, sigma: float) -> np.ndarray:
    """Unit-variance low-frequency field (gaussian-filtered white noise)."""
    f = ndimage.gaussian_filter(rng.standard_normal(shape).astype(np.float32), sigma)
    return f / (f.std() + 1e-8)


def _hard_volume(rng: np.random.Generator, shape) -> tuple[np.ndarray, np.ndarray]:
    """One volume of the HARD synthetic task (SSL-ablation fixture).

    The easy ellipsoid task saturates (Dice 0.998 by iter 1000) and so
    cannot show the SSL machinery mattering. This task is built so that
    a handful of labeled volumes underdetermine the decision rule while
    the unlabeled distribution still carries it:

      * lesions are 1-3 warped low-contrast blobs (contrast ~ N(0.14, 0.03)
        vs noise sigma 0.12 — near SNR 1);
      * 2-4 DISTRACTOR shells share the lesions' intensity but are
        hollow; telling filled-vs-hollow apart under this noise needs
        genuine shape context, not an intensity threshold;
      * every case gets its own multiplicative bias field and contrast
        draw, so appearance varies more across cases than a small
        labeled set can cover.

    Reference for what the ablation validates: the full DyCON loss
    composition train_DyCON_Pancreas.py:258 (CE+Dice + UnCL + FeCL +
    consistency) vs its supervised slice alone.
    """
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float32) for s in shape], indexing="ij"
    )
    # shared smooth warp makes both lesions and shells irregular
    warp = [8.0 * _smooth_field(rng, shape, sigma=8.0) for _ in range(3)]
    wz, wy, wx = zz + warp[0], yy + warp[1], xx + warp[2]

    def blob_d2(center, radii):
        return (
            ((wz - center[0]) / radii[0]) ** 2
            + ((wy - center[1]) / radii[1]) ** 2
            + ((wx - center[2]) / radii[2]) ** 2
        )

    label = np.zeros(shape, np.uint8)
    body = np.zeros(shape, np.float32)
    for _ in range(rng.integers(1, 4)):  # filled blobs = foreground
        center = [rng.uniform(0.25 * s, 0.75 * s) for s in shape]
        radii = [rng.uniform(0.08 * s, 0.16 * s) for s in shape]
        d2 = blob_d2(center, radii)
        label |= d2 <= 1.0
        body += np.clip(1.2 - d2, 0.0, 1.0)
    for _ in range(rng.integers(2, 5)):  # hollow shells = distractors
        center = [rng.uniform(0.2 * s, 0.8 * s) for s in shape]
        radii = [rng.uniform(0.09 * s, 0.18 * s) for s in shape]
        d2 = blob_d2(center, radii)
        shell = np.clip(1.2 - d2, 0.0, 1.0) * np.clip((d2 - 0.45) / 0.2, 0.0, 1.0)
        body += shell
    contrast = rng.normal(0.14, 0.03)
    tissue = 0.5 + 0.08 * _smooth_field(rng, shape, sigma=12.0)
    image = tissue + contrast * np.clip(body, 0.0, 1.0)
    image *= 1.0 + 0.25 * _smooth_field(rng, shape, sigma=16.0)  # bias field
    image += 0.12 * rng.standard_normal(shape).astype(np.float32)
    image = (image - image.min()) / (image.max() - image.min() + 1e-8)
    return image.astype(np.float32), label.astype(np.uint8)


def make_hard_pancreas(
    root: str, n_train: int = 40, n_test: int = 8, shape=(96, 96, 64), seed: int = 7
):
    """Pancreas-format tree of the HARD task (see _hard_volume), so the
    pancreas trainer/eval CLIs run on it unchanged. Used by the DyCON-vs-
    supervised ablation (BASELINE.md)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "Pancreas_data"), exist_ok=True)
    train = [f"PANCREAS_{i:04d}.h5" for i in range(n_train)]
    test = [f"PANCREAS_t{i:04d}.h5" for i in range(n_test)]
    for fname, items in (("train.list", train), ("test.list", test), ("test1.list", test)):
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(items) + "\n")
    for name in train + test:
        image, lab = _hard_volume(rng, shape)
        with h5py.File(os.path.join(root, "Pancreas_data", name), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=lab)
    return train, test


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
