"""BraTS-2019 NIfTI -> HDF5 preprocessing CLI (reference
BraTS19_DataPreprocessing.py): per-case z-score + min-max normalization
of one preferred modality (T2 > FLAIR > T1ce > T1), whole-tumor binary
label, resample to (192, 192, 64)."""

from __future__ import annotations

import argparse

from ..data.preprocess import preprocess_brats2019


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="BraTS-2019 NIfTI -> HDF5")
    p.add_argument("--input_dir", type=str, required=True,
                   help="MICCAI_BraTS_2019_Data_Training dir (HGG/ + LGG/)")
    p.add_argument("--output_dir", type=str, required=True,
                   help="destination for <case>.h5 files")
    p.add_argument("--cases", type=str, nargs="*", default=None,
                   help="specific case names (default: all found)")
    args = p.parse_args(argv)
    return preprocess_brats2019(args.input_dir, args.output_dir, args.cases)


if __name__ == "__main__":
    main()
