"""Measured same-hardware baseline: the reference's sliding-window
protocol, reproduced faithfully on this chip.

Reproduces `/root/reference/code/utils/test_3d_patch.py:293-351`
(`test_single_case`) exactly as the reference runs it:

- float32 everywhere (no bf16),
- ONE patch per forward (batch 1),
- an H2D transfer of the f32 patch per forward
  (`torch.from_numpy(test_patch).cuda()`, :335),
- a D2H transfer of the full (1, num_classes, *patch) softmax per
  forward (`y.cpu().data.numpy()`, :339),
- score/count accumulation in host numpy (:341-345).

The resulting vols/sec is the honest denominator for bench.py's
`vs_baseline`: same model, same chip, same eval protocol — only the
execution strategy differs. Run with JAX_COMPILATION_CACHE_DIR set;
prints one JSON line.
"""

from __future__ import annotations

import json
import math
import time

import numpy as np


PATCH = (96, 96, 96)
STRIDE_XY, STRIDE_Z = 16, 4
VOLUME_SHAPE = (192, 192, 64)  # BraTS19 preprocessed grid


def reference_single_case(forward, image, stride_xy, stride_z, patch_size):
    """Port of test_single_case (test_3d_patch.py:293-351): host loop,
    one patch per forward, per-patch H2D/D2H, numpy accumulation."""
    import jax

    w, h, d = image.shape
    w_pad = max(patch_size[0] - w, 0)
    h_pad = max(patch_size[1] - h, 0)
    d_pad = max(patch_size[2] - d, 0)
    add_pad = (w_pad or h_pad or d_pad)
    wl, hl, dl = w_pad // 2, h_pad // 2, d_pad // 2
    if add_pad:
        image = np.pad(
            image,
            [(wl, w_pad - wl), (hl, h_pad - hl), (dl, d_pad - dl)],
            mode="constant",
        )
    ww, hh, dd = image.shape
    sx = math.ceil((ww - patch_size[0]) / stride_xy) + 1
    sy = math.ceil((hh - patch_size[1]) / stride_xy) + 1
    sz = math.ceil((dd - patch_size[2]) / stride_z) + 1
    score_map = np.zeros((2,) + image.shape, np.float32)
    cnt = np.zeros(image.shape, np.float32)

    for x in range(sx):
        xs = min(stride_xy * x, ww - patch_size[0])
        for y_i in range(sy):
            ys = min(stride_xy * y_i, hh - patch_size[1])
            for z in range(sz):
                zs = min(stride_z * z, dd - patch_size[2])
                patch = image[xs:xs + patch_size[0], ys:ys + patch_size[1],
                              zs:zs + patch_size[2]]
                patch = patch[None, ..., None].astype(np.float32)
                dev_patch = jax.device_put(patch)       # H2D per patch
                probs = forward(dev_patch)
                probs = np.asarray(probs)               # D2H per patch (full softmax)
                y = probs[0, ..., 1]
                score_map[:, xs:xs + patch_size[0], ys:ys + patch_size[1],
                          zs:zs + patch_size[2]] += y
                cnt[xs:xs + patch_size[0], ys:ys + patch_size[1],
                    zs:zs + patch_size[2]] += 1
    score_map = score_map / cnt[None]
    label_map = (score_map[0] > 0.5).astype(int)
    if add_pad:
        label_map = label_map[wl:wl + w, hl:hl + h, dl:dl + d]
        score_map = score_map[:, wl:wl + w, hl:hl + h, dl:dl + d]
    return label_map, score_map


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.models import net_factory_3d

    # Reference conditions: f32 model, default layout, batch 1.
    model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=2)
    params, state = model.init(jax.random.key(0))

    @jax.jit
    def forward(x):
        (_, seg, _), _ = model.apply(params, state, x)
        return jax.nn.softmax(seg, axis=-1)

    rng = np.random.default_rng(0)
    volume = rng.standard_normal(VOLUME_SHAPE).astype(np.float32)

    # warmup/compile
    reference_single_case(forward, volume, STRIDE_XY, STRIDE_Z, PATCH)

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        reference_single_case(forward, volume, STRIDE_XY, STRIDE_Z, PATCH)
    dt = time.perf_counter() - t0
    vols_per_sec = n_iters / dt

    print(json.dumps({
        "metric": "reference_protocol_sliding_window",
        "value": round(vols_per_sec, 4),
        "unit": "vols/sec",
        "note": "reference per-patch loop (test_3d_patch.py:293-351) on this chip",
    }))


if __name__ == "__main__":
    main()
