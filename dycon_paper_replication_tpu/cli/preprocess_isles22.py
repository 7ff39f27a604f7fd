"""ISLES-2022 BIDS NIfTI -> HDF5 preprocessing CLI (reference
ISLES22_DataPreprocessing.py): DWI-preferred modality (adc/flair
fallback), mask from derivatives/, resample to (112, 112, 64),
reproducible 80/20 train/val split (seed 42)."""

from __future__ import annotations

import argparse

from ..data.preprocess import preprocess_isles22


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ISLES-2022 BIDS NIfTI -> HDF5")
    p.add_argument("--input_dir", type=str, required=True,
                   help="ISLES-2022 BIDS root (sub-strokecase*/ + derivatives/)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--modality", type=str, default="dwi", choices=["dwi", "adc", "flair"])
    p.add_argument("--cases", type=str, nargs="*", default=None)
    args = p.parse_args(argv)
    return preprocess_isles22(args.input_dir, args.output_dir, args.modality, args.cases)


if __name__ == "__main__":
    main()
