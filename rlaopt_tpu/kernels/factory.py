"""Kernel class factory.

Parity: ``rlaopt/kernels/factory.py:9-79`` — one named LinOp class pair per
kernel family, generated once at import. The "distributed" variant is the
mesh-sharded operator (:mod:`rlaopt_tpu.kernels.sharded`): sharding metadata
replaces the reference's worker processes.
"""

from typing import Tuple

import jax

from .configs import KernelConfig
from .linop import KernelLinOp


__all__ = ["_create_kernel_classes"]


def _create_kernel_classes(kernel_name: str, kind: str) -> Tuple[type, type]:
    """Create (``{Name}LinOp``, ``Sharded{Name}LinOp``) classes for a kernel."""

    def single_init(
        self,
        A1: jax.Array,
        A2: jax.Array,
        kernel_config: KernelConfig,
        impl: str = "auto",
        compute_dtype=None,
    ):
        KernelLinOp.__init__(
            self, A1, A2, kernel_config, kind=kind, impl=impl,
            compute_dtype=compute_dtype,
        )

    single = type(
        f"{kernel_name}LinOp",
        (KernelLinOp,),
        {
            "__init__": single_init,
            "__doc__": f"{kernel_name} kernel Gram operator (matrix-free).",
        },
    )
    jax.tree_util.register_pytree_node(
        single, single.tree_flatten, single.tree_unflatten
    )

    from .sharded import ShardedKernelLinOp

    def sharded_init(
        self,
        A1: jax.Array,
        A2: jax.Array,
        kernel_config: KernelConfig,
        mesh=None,
        axis: str = "i",
        impl: str = "auto",
        use_full_kernel: bool = True,
        memory_mode: str = "replicated",
        compute_dtype=None,
    ):
        ShardedKernelLinOp.__init__(
            self, A1, A2, kernel_config, kind=kind, mesh=mesh, axis=axis,
            impl=impl, use_full_kernel=use_full_kernel,
            memory_mode=memory_mode, compute_dtype=compute_dtype,
        )

    sharded = type(
        f"Sharded{kernel_name}LinOp",
        (ShardedKernelLinOp,),
        {
            "__init__": sharded_init,
            "__doc__": (
                f"{kernel_name} kernel Gram operator, row-sharded over a "
                "device mesh."
            ),
        },
    )
    return single, sharded
