"""Host-side input pipeline: HDF5 volume IO, numpy augmentations,
two-stream semi-supervised batching, and a prefetching device feeder."""

from .transforms import (
    CenterCrop,
    Compose,
    CreateOnehotLabel,
    RandomCrop,
    RandomNoise,
    RandomRotFlip,
    Resize,
    SagittalToAxial,
    ToArray,
)
from .samplers import TwoStreamBatchSampler, ThreeStreamBatchSampler
from .datasets import BraTS2019, Pancreas, ISLESDataset
from .pipeline import BatchLoader
