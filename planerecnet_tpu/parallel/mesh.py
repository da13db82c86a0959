"""Device-mesh utilities: the working replacement for the reference's broken
single-process ``CustomDataParallel`` (reference train.py:153-213,
README.md:103 "Multi-GPU Mode is not working").

Parallelism strategy (SURVEY.md §2 C16): the model is a feed-forward CNN, so
the first-class strategy is **data parallelism over the ICI mesh** — the batch
is sharded on its leading axis, parameters are replicated, and XLA emits the
gradient all-reduce automatically from the jit shardings. An optional second
``spatial`` mesh axis shards the image height dimension (XLA SPMD handles the
conv halo exchanges), the analogue of context parallelism for this workload.

Multi-host entry: call ``jax.distributed.initialize()`` before ``make_mesh``
and the same code spans hosts over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "spatial") mesh over the available devices.

    With ``n_data=None`` all devices go to the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    use = n_data * n_spatial
    if use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {use} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:use]).reshape(n_data, n_spatial)
    return Mesh(grid, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None):
    """Sharding for a batch pytree: leading axis over 'data'; optionally one
    spatial dim over 'spatial' (image height)."""
    def spec_for(x):
        ndim = getattr(x, "ndim", 0)
        if ndim == 0:
            return P()
        parts = [None] * ndim
        parts[0] = "data"
        if spatial_axis is not None and ndim > spatial_axis:
            parts[spatial_axis] = "spatial"
        return P(*parts)

    def to_sharding(x):
        return NamedSharding(mesh, spec_for(x))

    return to_sharding


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial_axis: Optional[int] = None):
    """Device-put a host batch pytree onto the mesh with batch sharding."""
    to_sharding = batch_sharding(mesh, spatial_axis)
    return jax.tree.map(
        lambda x: jax.device_put(x, to_sharding(x)), batch)
