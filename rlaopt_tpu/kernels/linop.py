"""Kernel Gram linear operators.

TPU re-design of the reference kernel linop stack (``rlaopt/kernels/base.py``):

* ``_KernelLinOp`` (base.py:23-128) wrapped a KeOps LazyTensor; here the
  operator is a pytree whose payload is the data (X1, X2, lengthscale, scale)
  and whose matvec streams blockwise kernel tiles
  (:func:`rlaopt_tpu.ops.kernel_dispatch.kernel_matmat`) — fused Pallas on
  TPU, XLA ``lax.map`` elsewhere. K is never materialized.
* ``_CacheableKernelLinOp`` + per-PID caches (base.py:131-244) have **no
  equivalent and no need**: XLA compiles the streaming matvec once per shape;
  there are no worker processes.
* ``row_oracle`` / ``blk_oracle`` (base.py:124-128) are index-gather + the
  same streaming kernel, traceable under jit with a static block size (SAP
  calls them inside ``lax.scan``).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .configs import KernelConfig, _is_kernel_config
from ..linops.base import TwoSidedLinOp
from ..ops.kernel_dispatch import kernel_matmat
from ..utils.checkers import _is_array


__all__ = ["KernelLinOp"]


class KernelLinOp(TwoSidedLinOp):
    """Matrix-free Gram operator K[i,j] = c·k(A1[i], A2[j])."""

    def __init__(
        self,
        A1: jax.Array,
        A2: jax.Array,
        kernel_config: KernelConfig,
        kind: str,
        impl: str = "auto",
        compute_dtype=None,
    ):
        self._check_inputs(A1, A2, kernel_config)
        from ..ops.kernel_pallas import normalize_compute_dtype

        # Canonicalize the tier spelling at construction (ValueError here,
        # not deep inside a traced matvec) — "bf16" and jnp.bfloat16 are
        # accepted aliases of "bfloat16".
        compute_dtype = normalize_compute_dtype(compute_dtype)
        self.kind = kind
        self.impl = impl
        self.compute_dtype = compute_dtype
        self._kernel_config = kernel_config
        ls = kernel_config.lengthscale_array(A1.dtype)
        scale = jnp.asarray(kernel_config.const_scaling, A1.dtype)
        data = {"X1": A1, "X2": A2, "ls": ls, "scale": scale}
        # Object identity decided HERE (pre-trace): under jit the payload's
        # X1/X2 become distinct tracers even when they are the same array,
        # so the symmetric-Gram hint must be captured at construction.
        symmetric = A1 is A2

        def mv(d, v):
            return kernel_matmat(
                kind, d["X1"], d["X2"], v, d["ls"], d["scale"], impl=impl,
                compute_dtype=compute_dtype, symmetric=symmetric,
            )

        def rmv(d, v):
            # k symmetric in its arguments: Kᵀ = k(X2, X1)
            return kernel_matmat(
                kind, d["X2"], d["X1"], v, d["ls"], d["scale"], impl=impl,
                compute_dtype=compute_dtype, symmetric=symmetric,
            )

        super().__init__(
            shape=(A1.shape[0], A2.shape[0]),
            matvec=mv,
            rmatvec=rmv,
            matmat=mv,
            rmatmat=rmv,
            dtype=A1.dtype,
            data=data,
        )

    @property
    def A1(self) -> jax.Array:
        return self._data["X1"]

    @property
    def A2(self) -> jax.Array:
        return self._data["X2"]

    @property
    def kernel_config(self) -> KernelConfig:
        return self._kernel_config

    def _check_inputs(self, A1, A2, kernel_config):
        _is_array(A1, "A1")
        _is_array(A2, "A2")
        if A1.ndim != 2:
            raise ValueError(f"A1 must be a 2D array, got {A1.ndim}D array.")
        if A2.ndim != 2:
            raise ValueError(f"A2 must be a 2D array, got {A2.ndim}D array.")
        if A1.dtype != A2.dtype:
            raise ValueError("A1 and A2 must have the same dtype.")
        _is_kernel_config(kernel_config, "kernel_config")

    def matmat_compensated(self, V):
        """``K @ V`` as a compensated (hi, lo) pair (add ``lo`` last).

        The Pallas path carries cross-tile rounding errors in a TwoSum
        companion, beating the plain f32 accumulation floor — used for
        residual evaluation near the f32 limit. Falls back to
        ``(K @ V, 0)`` off-TPU.
        """
        from ..ops.kernel_dispatch import kernel_matmat_compensated

        d = self._data
        return kernel_matmat_compensated(
            self.kind, d["X1"], d["X2"], V, d["ls"], d["scale"],
            impl=self.impl,
        )

    def _submatrix(
        self, idx1: Optional[jax.Array] = None, idx2: Optional[jax.Array] = None
    ) -> "KernelLinOp":
        """Operator over gathered subsets of the data points (jit-safe)."""
        A1 = self.A1 if idx1 is None else self.A1[idx1]
        A2 = self.A2 if idx2 is None else self.A2[idx2]
        return KernelLinOp(
            A1, A2, self._kernel_config, self.kind, self.impl,
            self.compute_dtype,
        )

    def row_oracle(self, blk: jax.Array) -> "KernelLinOp":
        """K[blk, :] as an operator."""
        return self._submatrix(idx1=blk)

    def blk_oracle(self, blk: jax.Array) -> "KernelLinOp":
        """K[blk, blk] as an operator."""
        return self._submatrix(idx1=blk, idx2=blk)

    def blk_dense(self, blk: jax.Array) -> jax.Array:
        """K[blk, blk] MATERIALIZED as a dense (|blk|, |blk|) array.

        One kernel-tile evaluation instead of a streamed matmat per apply:
        SAP re-applies the block operator ~power_iters + sketch times per
        iteration (powering, Nyström sketch, gradient preconditioning), so
        materializing once and reusing dense matmuls removes the repeated
        tile recomputation. Values are exact (distance expansion at
        ``Precision.HIGHEST`` in the payload dtype) regardless of the
        operator's ``compute_dtype`` speed tier — a strictly more accurate
        block preconditioner.
        """
        from .functions import kernel_tile, scale_inputs

        d = self._data
        Xs = scale_inputs(d["X1"][blk], d["ls"])
        Ys = scale_inputs(d["X2"][blk], d["ls"])
        return kernel_tile(self.kind, Xs, Ys) * d["scale"]

    # -- pytree protocol (payload arrays are children; config is rebuilt) ----
    def tree_flatten(self):
        children = (self._data, self._scale)
        aux = (
            self._shape,
            self._dtype,
            self._mv,
            self._mm,
            self._rmv,
            self._rmm,
            self.kind,
            self.impl,
            self.compute_dtype,
            self._kernel_config.const_scaling,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (
            obj._shape,
            obj._dtype,
            obj._mv,
            obj._mm,
            obj._rmv,
            obj._rmm,
            obj.kind,
            obj.impl,
            obj.compute_dtype,
            const_scaling,
        ) = aux
        obj._data, obj._scale = children
        cfg = object.__new__(KernelConfig)
        cfg.const_scaling = const_scaling
        cfg.lengthscale = obj._data["ls"]
        obj._kernel_config = cfg
        return obj


jax.tree_util.register_pytree_node(
    KernelLinOp, KernelLinOp.tree_flatten, KernelLinOp.tree_unflatten
)
