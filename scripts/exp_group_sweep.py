"""Sweep (patch_batch, group) for the grouped sliding-window engine on
the BraTS protocol (49 patches/volume).

Volume grouping fills forward chunks across volume boundaries, so the
chunk-padding waste becomes (ceil(49*G/B)*B - 49*G)/(49*G) — zero
whenever B divides 49*G. The round-2 single-volume sweep (patch_batch
7->0.86, 8->1.71, 12->0.67, 16->1.17 vols/sec) confounded batch shape
with padding waste; this sweep separates them.

One configuration per argv invocation (relay protocol: one benchmark
per process) or all in sequence by default. Prints one JSON line per
config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def run_config(patch_batch: int, group: int, n_iters: int | None = None) -> dict:
    # >= 4 dispatch units per timing run: with one group in flight the
    # un-overlapped head (first H2D) and tail (last D2H) are paid once —
    # at n_iters=2*group they dominate and large groups measure ~25% slow
    if n_iters is None:
        n_iters = max(16, 4 * group)
    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.eval import SlidingWindowInference
    from dycon_paper_replication_tpu.models import net_factory_3d

    on_tpu = jax.devices()[0].platform == "tpu"
    model = net_factory_3d(
        "unet_3D", in_chns=1, class_num=2, scaler=2,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        layout="folded" if on_tpu else "NDHWC",
    )
    params, state = model.init(jax.random.key(0))
    volume = np.random.default_rng(0).standard_normal((192, 192, 64)).astype(np.float32)
    sw = SlidingWindowInference(
        model, (96, 96, 96), stride_xy=16, stride_z=4,
        patch_batch=patch_batch,
        transfer_dtype=np.float16 if on_tpu else np.float32,
    )
    print(f"[compile] patch_batch={patch_batch} group={group}", file=sys.stderr, flush=True)
    for _ in sw.map(params, state, (volume for _ in range(group)), group=group):
        pass
    print("[compiled; timing]", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in sw.map(params, state, (volume for _ in range(n_iters)), group=group):
        pass
    dt = time.perf_counter() - t0
    k = 49 * group
    waste = ((k + patch_batch - 1) // patch_batch * patch_batch - k) / k
    return {
        "patch_batch": patch_batch,
        "group": group,
        "vols_per_sec": round(n_iters / dt, 4),
        "chunk_pad_waste": round(waste, 4),
    }


def main() -> None:
    if len(sys.argv) > 1:
        configs = [tuple(int(x) for x in sys.argv[1].split(","))]
    else:
        configs = [(8, 8), (8, 16), (16, 16), (16, 8), (8, 1), (4, 4)]
    for pb, g in configs:
        print(json.dumps(run_config(pb, g)), flush=True)


if __name__ == "__main__":
    main()
