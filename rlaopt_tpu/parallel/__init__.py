"""Mesh / sharding helpers (SPMD replacement for the reference's worker runtime)."""

from .distributed import (  # noqa: F401
    axis_size,
    initialize_multihost,
    make_mesh_2d,
    run_multiprocess_dryrun,
)
from .mesh import (  # noqa: F401
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated_sharding,
    row_sharding,
    shard_rows,
)

__all__ = [
    "axis_size",
    "initialize_multihost",
    "make_mesh",
    "make_mesh_2d",
    "pad_to_multiple",
    "replicate",
    "replicated_sharding",
    "row_sharding",
    "run_multiprocess_dryrun",
    "shard_rows",
]
