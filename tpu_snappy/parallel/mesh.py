"""Device mesh construction for data-parallel block sharding.

The reference has no multi-chip story (single RoCC on a single Rocket tile,
SURVEY.md §2.6); this layer is the TPU-native scaling design: independent
64 KB Snappy blocks are data-parallel by format definition (no cross-block
references), so the only mesh axis is `dp`. ICI/DCN collectives appear only
in the (offset, length) manifest gather — XLA inserts them from shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def block_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Blocks (B, 65536) sharded along the block axis."""
    return NamedSharding(mesh, P(axis, None))


def scalar_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Per-block scalars (B,) sharded along the block axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
