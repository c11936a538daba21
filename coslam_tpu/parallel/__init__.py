"""Multi-chip scaling: device mesh helpers and sharded train steps."""

from .sharding import make_mesh, maybe_shard  # noqa: F401
