"""One process of a 2-process `jax.distributed` CPU cluster running a
sharded DyCON train step (launched by tests/test_multihost.py).

Validates the multi-host path the reference never had working (its NCCL
helper `utils/util.py:240-244` is dead code): `distributed_init` builds
the coordinator connection, `make_mesh` spans BOTH processes' devices,
and the jitted train step executes with gloo cross-process collectives.

Usage: multihost_worker.py <process_id> <port> <out_json>
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from dycon_paper_replication_tpu.parallel import distributed_init, make_mesh
    from dycon_paper_replication_tpu.parallel.mesh import (
        put_global,
        replicate,
        replicate_tree,
        shard_batch,
    )

    distributed_init(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.config import make_config
    from dycon_paper_replication_tpu.models import net_factory_3d
    from dycon_paper_replication_tpu.train.state import create_train_state, make_optimizer
    from dycon_paper_replication_tpu.train.step import (
        StepScalars,
        build_train_step,
        unpack_scalars,
    )

    cfg = make_config(
        "pancreas", patch_size=(16, 16, 16), batch_size=4, labeled_bs=2,
        labelnum=2, max_iterations=3, val_every=2, save_every=100,
        feature_scaler=2, val_stride_xy=64, val_stride_z=64,
    )
    model = net_factory_3d(cfg.model, in_chns=1, class_num=2, scaler=2)
    opt = make_optimizer(lambda s: cfg.base_lr)
    # identical seed on every process -> identical host-side init, the
    # standard multi-controller SPMD pattern
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(build_train_step(model, opt, cfg))

    rng = np.random.default_rng(0)
    label = rng.integers(0, 2, size=(4, 16, 16, 16)).astype(np.int32)
    image = (label[..., None] * 0.5 + 0.1 * rng.normal(size=(4, 16, 16, 16, 1))).astype(
        np.float32
    )

    mesh = make_mesh()  # global: all devices of BOTH processes
    assert mesh.devices.size == jax.device_count()
    state_r = replicate_tree(mesh, state)
    batch = shard_batch(mesh, {"image": image, "label": label})
    key_r = put_global(jax.random.key(9), replicate(mesh))
    sc = StepScalars.make(5.0, 0.01, 1.3, 0.3)

    # Stagger compiles through a file barrier: on a 1-core host the two
    # processes would otherwise compile concurrently (minutes each) and
    # the faster one's first collective would blow gloo's 30 s context
    # rendezvous while the peer is still compiling. Serializing also
    # lets process 1 hit process 0's persistent-cache entry. Execution
    # itself starts only once BOTH are compiled.
    import time

    barrier_dir = os.path.dirname(os.path.abspath(out_path))
    mine = os.path.join(barrier_dir, f"compiled_{pid}")
    peer = os.path.join(barrier_dir, f"compiled_{1 - pid}")
    if pid == 1:
        while not os.path.exists(os.path.join(barrier_dir, "compiled_0")):
            time.sleep(0.5)
    compiled = step.lower(state_r, batch, key_r, sc).compile()
    with open(mine, "w"):
        pass
    while not os.path.exists(peer):
        time.sleep(0.5)

    new_state, m = compiled(state_r, batch, key_r, sc)
    loss = float(unpack_scalars(m)["loss"])
    leaf = jax.tree.leaves(new_state.params)[0]
    param_l1 = float(jnp.sum(jnp.abs(leaf)))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": loss, "param_l1": param_l1,
                   "global_devices": jax.device_count()}, f)


if __name__ == "__main__":
    main()
