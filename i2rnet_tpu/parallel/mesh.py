"""Device mesh and sharding helpers.

TPU-native replacement for the reference's DDP/NCCL layer
(``tools/ddp_train.py:87-98``: ``init_process_group('nccl')`` +
``DistributedDataParallel`` + ``DistributedSampler``):

* a named :class:`jax.sharding.Mesh` over the local (or distributed) devices,
  default axes ``('data',)`` and optional ``'model'`` axis for tensor-style
  sharding headroom;
* batches sharded over ``'data'`` (the DistributedSampler analog — each chip
  sees a batch shard, XLA inserts the gradient all-reduce that DDP did via
  NCCL);
* parameters replicated (pure DP, matching the reference's strategy — see
  SURVEY.md §2.6).

ICI/DCN note: on multi-slice deployments pass ``jax.make_mesh`` a shape whose
leading axis spans slices so data-parallel all-reduces ride ICI within a
slice and only cross DCN once per slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    ``shape`` may contain one -1 (filled with the remaining devices);
    default is all devices on a single 'data' axis.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = [-1] + [1] * (len(axes) - 1)
    shape = list(shape)
    if -1 in shape:
        fixed = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // max(fixed, 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the leading axis sharded on 'data'."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)
