"""Device mesh + sharding helpers.

The reference's parallelism is single-node DDP over NCCL
(training/vits2/train_ms.py:52-77). TPU-native, there is no backend code at
all: we build a ``jax.sharding.Mesh`` and annotate shardings; XLA inserts the
collectives (psum over ICI for gradients). Multi-host works through
``jax.distributed.initialize()`` + the same mesh.

Axes:
  data  — batch sharding (gradient all-reduce happens over this axis)
  model — reserved for tensor-parallel sharding of the widest vocoder convs
          (upsample_initial_channel) when HBM requires; 1 by default
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def data_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Data-parallel mesh over the largest device count that divides the
    per-host batch (XLA requires the sharded axis to divide evenly)."""
    devices = devices if devices is not None else jax.devices()
    n = max(len(devices), 1)
    while batch_size % n:
        n -= 1
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Places every array in the batch dict with its leading axis on 'data'.

    Multi-process (after ``jax.distributed.initialize``): each process passes
    its HOST-LOCAL rows and the result is the concatenated GLOBAL batch —
    the host-sharded data loading that replaces the reference's rank-sliced
    DistributedBucketSampler (train_ms.py:74-77)."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(s, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate_params(mesh: Mesh, params):
    r = replicated(mesh)
    if jax.process_count() > 1:
        # every process holds identical values (same PRNG init / checkpoint);
        # assemble them as one fully-replicated global array per leaf
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(r, np.asarray(x)), params)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), params)
