"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data parallel over NCCL
(``apis/train.py:102-110``, ``tools/dist_train.sh:8``). Here the equivalent —
and more — is a ``jax.sharding.Mesh`` with named axes:

* ``data``  — batch sharding (DDP equivalent; gradients psum'd by XLA)
* ``model`` — optional tensor-parallel axis (head/FFN sharding for ViT-L+;
  the reference has no TP, this is a superset)

Collectives ride ICI automatically; multi-host extends the same mesh over
DCN via ``jax.distributed.initialize`` — no NCCL-style plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def make_hybrid_mesh(model: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh for multi-slice pods: data parallelism spans DCN
    (slice boundaries), the model axis stays inside a slice on ICI.

    The reference scales only via NCCL DDP inside one node
    (``tools/dist_train.sh:8``); the TPU equivalent of its multi-node
    story is multi-slice. ``mesh_utils.create_hybrid_device_mesh`` orders
    devices so the slowest-varying data coordinate is the DCN (slice)
    axis — model-axis collectives (the latency-sensitive ones) never
    cross DCN, and the per-step gradient psum crosses it exactly once.

    Single-slice (or CPU test) environments fall back to ``make_mesh``.
    """
    if devices is None:
        devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    num_slices = len(slice_ids)
    if num_slices <= 1:
        return make_mesh(model=model, devices=devices)
    per_slice = len(devices) // num_slices
    if per_slice % model:
        raise ValueError(
            f"model={model} must divide the {per_slice} devices of a slice "
            "(the model axis may not straddle a DCN boundary)")
    from jax.experimental import mesh_utils
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // model, model),
        dcn_mesh_shape=(num_slices, 1),
        devices=devices)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    spec = P(*(("data",) + (None,) * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Assemble a host batch pytree into a batch-sharded global array.

    Single-process: a plain ``device_put`` with leading-axis sharding.
    Multi-process: the loader is already sharded per host (each host's numpy
    batch holds only its ``1/num_hosts`` slice of the global batch), so the
    global array must be assembled from per-process shards — ``device_put``
    with a global NamedSharding would instead treat each local batch as the
    whole global array and silently shrink the effective batch.
    """
    multiprocess = jax.process_count() > 1

    def _put(x):
        sharding = batch_sharding(mesh, np.ndim(x))
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)
