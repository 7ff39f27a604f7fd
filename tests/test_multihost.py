"""Multi-host execution test: a real 2-process `jax.distributed` CPU
cluster on localhost runs one sharded DyCON train step and must produce
the single-process loss and parameters.

This exercises the coordinator/mesh mechanics of
`parallel.mesh.distributed_init` (the reference's dead NCCL helper
`utils/util.py:240-244`, done the JAX way) end-to-end, short of a real
TPU pod: 2 processes x 2 virtual CPU devices each -> a 4-device global
mesh with gloo cross-process collectives.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _single_process_reference():
    """The same step on this process's (8-device) CPU mesh, single
    controller, as ground truth."""
    import jax
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
    state = create_train_state(model, jax.random.key(0), opt)
    step = jax.jit(build_train_step(model, opt, cfg))
    rng = np.random.default_rng(0)
    label = rng.integers(0, 2, size=(4, 16, 16, 16)).astype(np.int32)
    batch = {
        "image": jnp.asarray(
            label[..., None] * 0.5 + 0.1 * rng.normal(size=(4, 16, 16, 16, 1)),
            jnp.float32,
        ),
        "label": jnp.asarray(label),
    }
    new_state, m = step(state, batch, jax.random.key(9), StepScalars.make(5.0, 0.01, 1.3, 0.3))
    leaf = jax.tree.leaves(new_state.params)[0]
    return float(unpack_scalars(m)["loss"]), float(jnp.sum(jnp.abs(leaf)))


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="",  # the worker forces cpu at config level itself
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    outs = [tmp_path / f"out_{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(outs[i])],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["global_devices"] == 4 for r in results), results
    # both controllers observe the identical replicated result
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["param_l1"] == pytest.approx(results[1]["param_l1"], rel=1e-6)

    ref_loss, ref_l1 = _single_process_reference()
    assert results[0]["loss"] == pytest.approx(ref_loss, rel=2e-5)
    assert results[0]["param_l1"] == pytest.approx(ref_l1, rel=1e-4)
