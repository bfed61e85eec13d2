"""Mesh construction helpers.

The reference is strictly single-process (SURVEY.md §2C: no parallelism of
any kind); scale-out here is first-class: batched multi-subject monitoring
shards concurrent streams over chips (the BASELINE 64-stream config), long
recordings shard their time axis with halo exchange, and the landmark model
trains data+tensor parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "stream_mesh", "train_mesh", "shard"]


def make_mesh(axis_names: Sequence[str],
              axis_sizes: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    grid = np.array(devices).reshape(tuple(axis_sizes))
    return Mesh(grid, tuple(axis_names))


def stream_mesh(devices=None) -> Mesh:
    """1-D mesh over concurrent video streams (pure data parallelism)."""
    return make_mesh(("stream",), devices=devices)


def train_mesh(data: int, model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh for landmark-model training."""
    return make_mesh(("data", "model"), (data, model), devices=devices)


def shard(x, mesh: Mesh, *spec) -> jax.Array:
    """Place ``x`` with the given PartitionSpec entries."""
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
