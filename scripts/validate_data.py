"""Validate a real BraTS-2019 / Pancreas-CT / ISLES-2022 data tree so
the canonical runs are one command once volumes appear (VERDICT r3 #8).

    python scripts/validate_data.py --dataset pancreas --root data/Pancreas

Checks, per dataset convention (data/README.md):
  * the split-list files exist and every listed case's .h5 is present;
  * each .h5 exposes the expected datasets ('image' + 'label'/'mask');
  * shapes match between image and label, dims fit the canonical patch;
  * dtypes are numeric and labels are {0,1}-valued (spot-checked).

Exit code 0 and a summary line on success; a per-problem listing and
exit 1 otherwise. Read-only — safe on the real tree.
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np

CANONICAL_PATCH = {
    "pancreas": (112, 112, 96),
    "brats19": (96, 96, 96),
    "isles22": (96, 96, 64),
}


def _cases(root: str, dataset: str) -> list[tuple[str, str]]:
    """[(case_name, h5_path)] from the split lists (train + test/val)."""
    out = []
    if dataset == "pancreas":
        for lst in ("train.list", "test.list"):
            with open(os.path.join(root, lst)) as f:
                for name in filter(None, (l.strip() for l in f)):
                    out.append((name, os.path.join(root, "Pancreas_data", name)))
    elif dataset == "brats19":
        for lst in ("train.txt", "test.txt"):
            with open(os.path.join(root, lst)) as f:
                for name in filter(None, (l.strip() for l in f)):
                    out.append((name, os.path.join(root, "data", f"{name}.h5")))
    elif dataset == "isles22":
        for lst in ("train.list", "val.list"):
            with open(os.path.join(root, lst)) as f:
                for name in filter(None, (l.strip() for l in f)):
                    out.append((name, os.path.join(root, f"{name}.h5")))
    else:
        raise ValueError(dataset)
    return out


def validate(root: str, dataset: str, spot_check: int = 5) -> list[str]:
    problems: list[str] = []
    try:
        cases = _cases(root, dataset)
    except FileNotFoundError as e:
        return [f"missing split list: {e.filename}"]
    if not cases:
        return ["split lists are empty"]
    label_key = "mask" if dataset == "isles22" else "label"
    patch = CANONICAL_PATCH[dataset]
    checked = 0
    for name, path in cases:
        if not os.path.exists(path):
            problems.append(f"{name}: missing file {path}")
            continue
        try:
            with h5py.File(path, "r") as f:
                missing = [k for k in ("image", label_key) if k not in f]
                if missing:
                    problems.extend(f"{name}: no '{k}' dataset" for k in missing)
                    continue  # keep validating the remaining cases
                img, lab = f["image"], f[label_key]
                ish = img.shape[-3:] if img.ndim > 3 else img.shape
                if lab.shape[-3:] != ish:
                    problems.append(f"{name}: image {img.shape} vs {label_key} {lab.shape}")
                if any(s < p for s, p in zip(ish, patch)):
                    problems.append(
                        f"{name}: volume {ish} smaller than canonical patch {patch}"
                        " (the loader pads, but check preprocessing)"
                    )
                if checked < spot_check:
                    lv = np.unique(np.asarray(lab[..., : min(8, lab.shape[-1])]))
                    if not np.isin(lv, [0, 1]).all():
                        problems.append(f"{name}: non-binary label values {lv[:6]}")
                    checked += 1
        except OSError as e:
            problems.append(f"{name}: unreadable h5 ({e})")
    print(f"{dataset}: {len(cases)} cases listed, {len(problems)} problems")
    return problems


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=list(CANONICAL_PATCH))
    p.add_argument("--root", required=True)
    args = p.parse_args(argv)
    problems = validate(args.root, args.dataset)
    for line in problems:
        print("  PROBLEM:", line)
    print("OK" if not problems else "FAILED")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
