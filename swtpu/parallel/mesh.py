"""Device mesh helpers.

The reference is strictly single-GPU (no streams, NCCL, or MPI anywhere —
SURVEY.md §2 parallelism inventory); multi-chip/multi-host scaling is new
capability this engine adds per BASELINE.json config 5.  The model is
database sharding: every chip holds a contiguous shard of the sequence
database, queries are broadcast, and per-shard results merge with XLA
collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DB_AXIS = "db"


def make_mesh(n_devices: Optional[int] = None, axis: str = DB_AXIS) -> Mesh:
    """A 1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.array(devs[:n]), (axis,))


def db_sharding(mesh: Mesh) -> NamedSharding:
    """Subjects batch sharded along rows (one DB shard per device)."""
    return NamedSharding(mesh, P(DB_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Multi-host bring-up; alias of swtpu.parallel.distributed.initialize."""
    from .distributed import initialize

    initialize(coordinator_address=coordinator, num_processes=num_processes, process_id=process_id)
