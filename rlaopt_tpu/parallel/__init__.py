"""Mesh / sharding helpers (SPMD replacement for the reference's worker runtime)."""

from .mesh import (  # noqa: F401
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated_sharding,
    row_sharding,
    shard_rows,
)

__all__ = [
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated_sharding",
    "row_sharding",
    "shard_rows",
]
