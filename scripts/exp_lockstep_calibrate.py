"""One-off calibration for tests/test_lockstep.py tolerances.

Runs three arms on identical weights/batches/noise:
  A. our f32 jitted train_step,
  B. the reference torch loop in float64 (ground truth),
  C. the reference torch loop in float32 (framework-intrinsic drift).

Prints, per tracked series, max |A-B|/|B| and max |C-B|/|B| over the 20
steps — if A's deviation is the same order as C's, our step is exact to
f32 precision and the test tolerance can be set from C's envelope.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import test_lockstep as L


def main():
    images, labels = L._make_batches()
    params0, state0, noises, ours = L._our_trajectory(images, labels)
    ref64 = L._torch_trajectory(params0, state0, images, labels, noises)
    # f32 arm: monkeypatch dtype
    orig = L._torch_trajectory

    def f32_traj(params0, state0, images, labels, noises):
        return orig(params0, state0, images, labels, noises, dtype=torch.float32)

    ref32 = f32_traj(params0, state0, images, labels, noises)

    print(f"{'series':12s} {'ours_vs_f64':>12s} {'torchf32_vs_f64':>16s}")
    for k in L.KEYS:
        a = np.array([r[k] for r in ours])
        b = np.array([r[k] for r in ref64])
        c = np.array([r[k] for r in ref32])
        da = np.max(np.abs(a - b) / (np.abs(b) + 1e-12))
        dc = np.max(np.abs(c - b) / (np.abs(b) + 1e-12))
        print(f"{k:12s} {da:12.3e} {dc:16.3e}")
    print("first-step rel devs (ours vs f64):")
    for k in L.KEYS:
        a, b = ours[0][k], ref64[0][k]
        print(f"  {k:12s} {abs(a - b) / (abs(b) + 1e-12):.3e}")


if __name__ == "__main__":
    main()
