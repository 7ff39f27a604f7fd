"""Numpy volume transforms over {'image', 'label'} sample dicts.

Semantics mirror the reference's per-dataset transform suites
(dataloaders/brats19.py:86-286 and twins) but take an explicit
`numpy.random.Generator` so the pipeline is deterministic and
parallelizable (the reference relies on the global legacy RNG).

Output convention: `ToArray` produces image (D1, D2, D3, 1) float32 —
channels-LAST for the TPU layout — and label (D1, D2, D3) int32.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class SagittalToAxial:
    """Transpose (H, W, D) -> (D, W, H) to put BraTS volumes in axial view."""

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        image, label = sample["image"], sample["label"]
        if image.shape != label.shape:
            raise ValueError("image/label shape mismatch")
        return {"image": np.transpose(image, (2, 1, 0)), "label": np.transpose(label, (2, 1, 0))}


def _pad_margin(shape, output_size):
    """Pad widths when the volume is not strictly larger than the crop:
    half the deficit plus a 3-voxel safety margin per side (reference's
    RandomCrop/CenterCrop pad rule, brats19.py:195-203)."""
    pads = []
    needs = any(s <= o for s, o in zip(shape, output_size))
    for s, o in zip(shape, output_size):
        pads.append(max((o - s) // 2 + 3, 0) if needs else 0)
    return needs, pads


class CenterCrop:
    def __init__(self, output_size):
        self.output_size = tuple(output_size)

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        image, label = sample["image"], sample["label"]
        needs, pads = _pad_margin(label.shape, self.output_size)
        if needs:
            pw = [(p, p) for p in pads]
            image = np.pad(image, pw, mode="constant")
            label = np.pad(label, pw, mode="constant")
        starts = [
            int(round((s - o) / 2.0)) for s, o in zip(image.shape, self.output_size)
        ]
        sl = tuple(slice(st, st + o) for st, o in zip(starts, self.output_size))
        return {"image": image[sl], "label": label[sl]}


class RandomCrop:
    """Uniform random crop to `output_size` (pad-with-margin if small)."""

    def __init__(self, output_size, with_sdf: bool = False):
        self.output_size = tuple(output_size)
        self.with_sdf = with_sdf

    def origin(self, shape, rng: np.random.Generator):
        return [int(rng.integers(0, s - o)) if s > o else 0 for s, o in zip(shape, self.output_size)]

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        image, label = sample["image"], sample["label"]
        extra = {k: v for k, v in sample.items() if k not in ("image", "label")}
        needs, pads = _pad_margin(label.shape, self.output_size)
        if needs:
            pw = [(p, p) for p in pads]
            image = np.pad(image, pw, mode="constant")
            label = np.pad(label, pw, mode="constant")
            extra = {k: np.pad(v, pw, mode="constant") for k, v in extra.items()}
        starts = self.origin(image.shape, rng)
        sl = tuple(slice(st, st + o) for st, o in zip(starts, self.output_size))
        out = {"image": image[sl], "label": label[sl]}
        out.update({k: v[sl] for k, v in extra.items()})
        return out


class RandomRotFlip:
    """k*90-degree rotation in the first two axes plus a random flip along
    axis 0 or 1 (always applied, like the reference)."""

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        image, label = sample["image"], sample["label"]
        k = int(rng.integers(0, 4))
        image = np.rot90(image, k)
        label = np.rot90(label, k)
        axis = int(rng.integers(0, 2))
        # views, not copies: ToArray's ascontiguousarray (or the batch
        # assembler's buffer fill) is the single materialization point —
        # on a 1-core host every avoided 10-40 MB copy is step latency
        image = np.flip(image, axis=axis)
        label = np.flip(label, axis=axis)
        return {"image": image, "label": label}


class RandomNoise:
    """Additive Gaussian noise clipped to ±2 sigma, plus offset mu."""

    def __init__(self, mu: float = 0.0, sigma: float = 0.1):
        self.mu = mu
        self.sigma = sigma

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        image, label = sample["image"], sample["label"]
        noise = np.clip(
            self.sigma * rng.standard_normal(image.shape), -2 * self.sigma, 2 * self.sigma
        )
        return {"image": image + noise + self.mu, "label": label}


class Resize:
    """Trilinear image / nearest label resize to a fixed grid."""

    def __init__(self, output_size):
        self.output_size = tuple(output_size)

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        from scipy import ndimage

        image, label = sample["image"], sample["label"]
        zoom = [o / s for o, s in zip(self.output_size, image.shape)]
        image = ndimage.zoom(image, zoom, order=1, mode="constant", cval=0.0)
        label = ndimage.zoom(label.astype(np.uint8), zoom, order=0)
        return {"image": image, "label": label}


class CreateOnehotLabel:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        label = sample["label"]
        onehot = np.stack(
            [(label == i).astype(np.float32) for i in range(self.num_classes)], axis=0
        )
        return {**sample, "onehot_label": onehot}


class ToArray:
    """Finalize: image -> (D1, D2, D3, 1) f32 channels-last, label -> i32."""

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        image = np.ascontiguousarray(sample["image"], dtype=np.float32)[..., None]
        out = {"image": image, "label": np.ascontiguousarray(sample["label"], dtype=np.int32)}
        if "onehot_label" in sample:
            out["onehot_label"] = sample["onehot_label"].astype(np.int64)
        return out
