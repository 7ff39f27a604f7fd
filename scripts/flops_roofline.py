"""Dense-FLOP roofline for the headline protocols (VERDICT r4 next #6).

Counts the XLA-reported FLOPs of (a) one NDHWC UNet3D seg forward at the
BraTS eval patch (the mathematically necessary work — no fold-2 64/27
tap redundancy), and (b) one full Pancreas train step, then converts the
measured v5e throughputs (BASELINE.md) into MFU against the chip's
197 TFLOP/s bf16 peak. Runs entirely on CPU (compile-only cost
analysis; never claims the TPU), so it can run alongside device jobs.

Usage: python scripts/flops_roofline.py  -> one JSON line + artifact in
bench_results/roofline.json.
"""

from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never claim the TPU

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e: 394 TOPS int8 / 197 TFLOP/s bf16


def _flops(fn, *args) -> float:
    c = jax.jit(fn).lower(*args).compile()
    (analysis,) = [c.cost_analysis()] if isinstance(c.cost_analysis(), dict) else [
        c.cost_analysis()[0]
    ]
    return float(analysis["flops"])


def main() -> None:
    from dycon_paper_replication_tpu.models import net_factory_3d

    out: dict = {"peak_bf16_tflops": V5E_BF16_PEAK_TFLOPS}

    # (a) inference: one seg forward (projection skipped, eval protocol)
    model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                           layout="NDHWC")
    params, state = model.init(jax.random.key(0))
    x1 = jnp.zeros((1, 96, 96, 96, 1), jnp.float32)

    def fwd(params, state, x):
        (_, logits, _), _ = model.apply(params, state, x, train=False,
                                        with_projection=False)
        return logits

    f_patch = _flops(fwd, params, state, x1)
    out["fwd_flops_per_96cube_patch"] = f_patch
    # BraTS eval protocol: 49 patches/volume (stride 16/4 over 192x192x64)
    out["fwd_flops_per_brats_volume"] = f_patch * 49
    # measured compute-only ceiling (bench.py device-resident runner)
    for tag, vols_per_sec in (("bench_wall_1p8944", 1.8944),
                              ("compute_only_2p1155", 2.1155)):
        mfu = f_patch * 49 * vols_per_sec / (V5E_BF16_PEAK_TFLOPS * 1e12)
        out[f"inference_dense_mfu_{tag}"] = round(mfu, 4)

    # (b) train step: full Pancreas config (bs 8, 112x112x96) is too big
    # to lower quickly on this 1-core host; lower at quarter batch and
    # scale (FLOPs are linear in batch for this static graph).
    from dycon_paper_replication_tpu.config import TrainConfig
    from dycon_paper_replication_tpu.train.state import (
        create_train_state, make_optimizer,
    )
    from dycon_paper_replication_tpu.train.step import StepScalars, build_train_step

    cfg = TrainConfig(dataset="pancreas", patch_size=(112, 112, 96),
                      batch_size=2, labeled_bs=1, remat="none",
                      step_diagnostics="cadence", layout="NDHWC")
    tmodel = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2,
                            layout="NDHWC")
    opt = make_optimizer(lambda s: cfg.base_lr)
    tstate = create_train_state(tmodel, jax.random.key(0), opt)
    step = build_train_step(tmodel, opt, cfg, diagnostics=False)
    batch = {
        "image": jnp.zeros((2, 112, 112, 96, 1), jnp.float32),
        "label": jnp.zeros((2, 112, 112, 96), jnp.int32),
    }
    sc = StepScalars.make(5.0, 0.1, 1.4, 0.35)
    f_step_bs2 = _flops(step, tstate, batch, jax.random.key(1), sc)
    f_step = f_step_bs2 * 4  # linear scale bs2 -> bs8
    out["train_step_flops_bs8_est"] = f_step
    out["train_step_flops_bs2_measured"] = f_step_bs2
    # measured 416.3 ms/step (BASELINE.md round-4, folded remat=none)
    out["train_dense_mfu_at_416ms"] = round(
        f_step / 0.4163 / (V5E_BF16_PEAK_TFLOPS * 1e12), 4
    )

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
