"""Device-mesh helpers.

The reference's multi-device runtime is spawn-process workers + queues with
CPU-staged tensors (``rlaopt/linops/base.py:114-292``). The TPU equivalent is
a single-controller JAX program over a :class:`jax.sharding.Mesh`: placement
is data metadata, communication is XLA collectives over ICI. These helpers
standardize the 1-D operator mesh the toolkit uses (axis ``"i"`` = the
row/point dimension).
"""

from typing import Optional, Sequence

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


__all__ = [
    "make_mesh",
    "replicate",
    "shard_rows",
    "row_sharding",
    "replicated_sharding",
    "pad_to_multiple",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = "i",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D mesh over ``n_devices`` (default: all local devices).

    WARNING: on the XLA:CPU backend (forced host devices), ``ppermute``
    over a mesh built on a proper SUBSET of the platform's devices is
    unreliable — measured flaky heap corruption (glibc aborts) and wrong
    collective results. Ring-mode operators should use all devices of
    the platform; to exercise a smaller ring, launch a process with
    ``--xla_force_host_platform_device_count=<n>`` instead (see
    tests/parallel/test_sharded.py::TestSymmetricRing).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} exist"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def row_sharding(mesh: Mesh, axis: str = "i", ndim: int = 2) -> NamedSharding:
    """Sharding with the leading dim split over ``axis``, rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0):
    """Zero-pad ``x`` along ``axis`` to a multiple; returns (padded, orig_len)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target - n)
    return jnp.pad(x, pad_widths), n


def shard_rows(x: jax.Array, mesh: Mesh, axis: str = "i") -> jax.Array:
    """Place ``x`` with its leading dim sharded over the mesh axis."""
    return jax.device_put(x, row_sharding(mesh, axis, x.ndim))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place ``x`` fully replicated over the mesh."""
    return jax.device_put(x, replicated_sharding(mesh))
