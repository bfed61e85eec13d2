"""Multi-chip scaling: meshes, stream data-parallelism, time-axis sharding."""

from . import long, mesh, streams, time_shard  # noqa: F401
