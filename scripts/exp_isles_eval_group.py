"""ISLES whole-volume eval wall time: serial vs pipelined vs grouped.

Measures the VERDICT-r2 #5/#7 claim with a number: the reference's ISLES
validation (test_ISLES22.py:87-163) runs one volume at a time with a
fully serialized H2D -> forward -> D2H; WholeVolumeInference.map()
pipelines dispatches and `group=N` batches same-shape volumes into one
device program. 25 volumes at the canonical preprocessed ISLES shape
(112,112,64), untrained weights (timing only).

One JSON line per mode. Run on the TPU with
JAX_COMPILATION_CACHE_DIR=.jax_cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

N_VOLS = 25
SHAPE = (112, 112, 64)  # ISLES22_DataPreprocessing.py:148-155 zoom target


def main() -> None:
    import jax

    from dycon_paper_replication_tpu.eval.evaluator import WholeVolumeInference
    from dycon_paper_replication_tpu.models import net_factory_3d

    import jax.numpy as jnp

    model = net_factory_3d("unet_3D", in_chns=1, class_num=2, scaler=4,
                           compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.key(0))
    wv = WholeVolumeInference(model, (96, 96, 64), head="seg")

    rng = np.random.default_rng(0)
    vols = [(rng.standard_normal(SHAPE).astype(np.float32),
             (rng.random(SHAPE) > 0.99).astype(np.uint8)) for _ in range(N_VOLS)]

    def timed(mode, fn):
        fn()  # warmup (compile + first relay round-trips)
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": "isles_wholevolume_eval", "mode": mode,
                          "n_vols": n, "wall_s": round(dt, 3),
                          "vols_per_sec": round(n / dt, 3)}), flush=True)

    def serial():
        # reference execution shape: one volume fully round-tripped at a time
        n = 0
        for img, _lab in vols:
            _ = wv.predict(params, state, img)
            n += 1
        return n

    def pipelined(group):
        n = 0
        for _pred, _lab in wv.map(params, state, iter(vols), group=group):
            n += 1
        return n

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("serial", "all"):
        timed("serial", serial)
    if mode in ("pipelined", "all"):
        timed("pipelined_g1", lambda: pipelined(1))
    if mode in ("grouped", "all"):
        timed("pipelined_g4", lambda: pipelined(4))


if __name__ == "__main__":
    main()
