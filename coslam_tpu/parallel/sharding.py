"""Device-mesh sharding for ray-parallel training steps.

The ray-batch dimension is embarrassingly parallel in every hot loop
(tracking forward, BA forward, first-frame mapping), so multi-chip
scaling is pure data parallelism over rays: scene parameters are
replicated, ray blocks are sharded over a 1-D `jax.sharding.Mesh`
('dp'), and XLA/GSPMD inserts the psum for the parameter gradients over
ICI. No NCCL-style code: the single-chip megasteps become multi-chip by
adding `with_sharding_constraint` annotations on the assembled ray
batches (see runtime/mapping.py and runtime/tracking.py, `mesh=` arg).

The reference has no multi-device path at all (SURVEY §2.7) — its only
concurrency is a two-process tracker/mapper split on one GPU; see
runtime/pipeline.py for that equivalent.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def maybe_shard(x: jax.Array, mesh: Optional[Mesh], axis: str = "dp"):
    """Constrain dim 0 of x to be sharded over `axis` (no-op without mesh)."""
    if mesh is None:
        return x
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Optional[Mesh]):
    """Constrain a pytree to be fully replicated on the mesh."""
    if mesh is None:
        return x
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(a, sharding), x)
