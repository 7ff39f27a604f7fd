"""Offline BraTS-2019 evaluation (reference test_BraTS19.py): dense
sliding-window eval over val.txt, largest-CC post-processing,
Dice/Jaccard/HD95/ASD table.

Faithfulness note: the reference's offline test reads volumes WITHOUT
the sagittal->axial transpose that training/validation apply
(test_3d_patch.py:86-92 vs :63-64) — it evaluates in the stored view.
`--axial 1` opts into the (arguably more correct) axial-view eval.
"""

from __future__ import annotations

import os

from ..eval import iter_h5_volumes
from .test_pancreas import build_parser, run_test


def main(argv=None):
    p = build_parser()
    p.set_defaults(root_path="../data/BraTS2019", exp="BraTS2019", labelnum=25,
                   list_name="val.txt")
    p.add_argument("--axial", type=int, default=0,
                   help="evaluate in axial view (reference offline test uses stored view)")
    args = p.parse_args(argv)
    with open(os.path.join(args.root_path, args.list_name)) as f:
        names = [l.strip() for l in f if l.strip()]
    paths = [os.path.join(args.root_path, "data", f"{n}.h5") for n in names]
    return run_test(args, "brats19", iter_h5_volumes(paths, axial_transpose=bool(args.axial)))


if __name__ == "__main__":
    main()
