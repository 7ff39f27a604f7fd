"""Device mesh + sharding rules for DyCON training.

The reference's only multi-device mechanism is single-process
DataParallel (train_DyCON_BraTS19.py:180-193). The TPU-native
replacement is SPMD data parallelism over a 1-D `jax.sharding.Mesh`:

  * the batch axis is sharded over the `data` mesh axis;
  * params / optimizer / teacher state are replicated;
  * XLA inserts the cross-chip `psum` for the gradient mean
    automatically (every DyCON loss term reduces within-sample, so pure
    DP is mathematically exact — SURVEY.md §5);
  * the EMA update is purely local on replicated params — no
    communication at all;
  * multi-host runs use the same program over DCN after
    `jax.distributed.initialize()`.

Batch-norm note: under jit+GSPMD the projection head's BatchNorm
reduces over the FULL (sharded) batch — XLA inserts the cross-shard
all-reduce — so multi-chip statistics equal single-chip statistics
(this is what makes DP bit-exact here; see the DP-exactness test).
This differs from the reference's DataParallel, which normalized each
GPU's sub-batch independently. Divisibility: the trainer mirrors the
reference's adjustment (train_DyCON_BraTS19.py:93-110) — it keeps the
mesh and rounds batch_size / labeled_bs DOWN to multiples of the mesh
size, and linearly scales the learning rate (Trainer.
_apply_multi_device_rules). `make_mesh`'s optional batch_size clamp is
the opposite fallback for callers that must keep the batch fixed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, batch_size: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices (0 = all).
    If `batch_size` is given, clamp the mesh to the largest device count
    that divides it."""
    devices = jax.devices()
    n = n_devices if n_devices > 0 else len(devices)
    n = min(n, len(devices))
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    return Mesh(np.array(devices[:n]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """`device_put` that also works on a MULTI-HOST mesh.

    `jax.device_put` rejects shardings spanning non-addressable devices;
    on a multi-controller mesh every process calls this with the same
    host value (the SPMD convention: identical seeds/data per process)
    and contributes its addressable shards via
    `make_array_from_callback`. Typed PRNG keys are handled through
    their raw key data."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        kd = put_global(np.asarray(jax.random.key_data(x)), sharding)
        return jax.random.wrap_key_data(kd, impl=jax.random.key_impl(x))
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Host numpy batch -> device arrays sharded along the batch axis."""
    sh = batch_sharding(mesh)
    return {k: put_global(v, sh) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    rep = replicate(mesh)
    return jax.tree.map(lambda x: put_global(x, rep), tree)


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (the reference's unused NCCL
    `distributed_setup`, utils/util.py:240-244, done the JAX way): call
    once per host before creating the mesh; afterwards jax.devices()
    spans all hosts and the same SPMD program runs over DCN. No-op when
    JAX already knows its distributed context (e.g. TPU pod env vars)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
