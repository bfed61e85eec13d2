"""Multi-chip scaling: meshes, stream data-parallelism, time-axis sharding."""

from . import mesh, streams, time_shard  # noqa: F401
