"""Sparse CSR/CSC tensor.

Parity with the reference wrapper (``rlaopt/sparse/sparse_tensor.py:14-220``):
scipy round-trip, row slicing via the native gather op, ``@``/``__rmatmul__``
for 1-D/2-D operands, and the zero-copy CSR↔CSC transpose that just relabels
the index buffers. Re-designed storage: plain JAX arrays
(values / indices / indptr) instead of torch sparse tensors — placement and
sharding are array metadata.
"""

import os
from enum import Enum, auto

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .ell import csr_to_ell, ell_matmat, ell_matvec
from ..utils.checkers import _is_array


__all__ = ["SparseCSRTensor", "_SparseTensor", "_Layout"]


class _Layout(Enum):
    CSR = auto()
    CSC = auto()


def _ell_enabled() -> bool:
    """Use the scatter-free ELL path for ``@``? Default: accelerators only
    (the CPU backend has the native C++ kernels). Override with
    ``RLAOPT_SPARSE_ELL=1/0``."""
    env = os.environ.get("RLAOPT_SPARSE_ELL")
    if env is not None:
        return env.lower() not in ("0", "false", "")
    return jax.default_backend() != "cpu"


class _SparseTensor:
    """Sparse matrix in CSR or CSC layout over JAX arrays.

    Attributes:
        values: (nnz,) nonzero values.
        indices: (nnz,) column indices (CSR) or row indices (CSC).
        indptr: (n_rows+1,) or (n_cols+1,) compressed pointers.
        shape: logical (n_rows, n_cols).
        layout: _Layout.CSR or _Layout.CSC.
    """

    def __init__(self, values, indices, indptr, shape, layout: _Layout):
        self.values = jnp.asarray(values)
        self.indices = jnp.asarray(indices)
        self.indptr = jnp.asarray(indptr)
        self.shape = (int(shape[0]), int(shape[1]))
        self.layout = layout
        # Lazy hybrid-ELL cache for accelerator matmuls, keyed by buffer
        # orientation ("B" = buffers read as CSR, "BT" = its transpose) and
        # SHARED with transpose views (.T passes the same dict), so
        # ``A @ x`` then ``A.T @ y`` build each ELL at most once.
        self._ell_cache: dict = {}
        major = shape[0] if layout == _Layout.CSR else shape[1]
        if self.indptr.shape[0] != major + 1:
            raise ValueError(
                f"indptr has length {self.indptr.shape[0]}, expected {major + 1}"
            )
        if self.values.shape != self.indices.shape:
            raise ValueError("values and indices must have the same length")

    # -- properties ----------------------------------------------------------
    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self) -> int:
        return int(self.values.shape[0])

    def astype(self, dtype) -> "_SparseTensor":
        return _SparseTensor(
            self.values.astype(dtype), self.indices, self.indptr, self.shape,
            self.layout,
        )

    # -- scipy interop -------------------------------------------------------
    @classmethod
    def from_scipy(cls, mat) -> "_SparseTensor":
        import scipy.sparse as sp

        if sp.issparse(mat):
            if mat.format == "csr":
                layout = _Layout.CSR
            elif mat.format == "csc":
                layout = _Layout.CSC
            else:
                mat = mat.tocsr()
                layout = _Layout.CSR
            return cls(mat.data, mat.indices, mat.indptr, mat.shape, layout)
        raise TypeError(f"expected a scipy sparse matrix, got {type(mat)}")

    def to_scipy(self):
        import scipy.sparse as sp

        cls = sp.csr_matrix if self.layout == _Layout.CSR else sp.csc_matrix
        return cls(
            (
                np.asarray(self.values),
                np.asarray(self.indices),
                np.asarray(self.indptr),
            ),
            shape=self.shape,
        )

    def todense(self) -> jax.Array:
        return jnp.asarray(self.to_scipy().toarray())

    # -- transpose: zero-copy relabel (reference lines 128-163) --------------
    @property
    def T(self) -> "_SparseTensor":
        new_layout = (
            _Layout.CSC if self.layout == _Layout.CSR else _Layout.CSR
        )
        t = _SparseTensor(
            self.values,
            self.indices,
            self.indptr,
            (self.shape[1], self.shape[0]),
            new_layout,
        )
        t._ell_cache = self._ell_cache  # same buffers → share the ELL cache
        return t

    # -- row slicing ---------------------------------------------------------
    def __getitem__(self, idx) -> "_SparseTensor":
        """Row gather (CSR only, like the reference's get_row_slice op)."""
        if self.layout != _Layout.CSR:
            raise NotImplementedError(
                "row slicing is only supported for CSR layout; transpose or "
                "convert first"
            )
        idx = self._normalize_indices(idx)
        v, c, p = ops.gather_rows(self.values, self.indptr, self.indices, idx)
        return _SparseTensor(
            v, c, p, (len(idx), self.shape[1]), _Layout.CSR
        )

    def _normalize_indices(self, idx) -> np.ndarray:
        n = self.shape[0]
        if isinstance(idx, slice):
            out = np.arange(*idx.indices(n))
        elif isinstance(idx, int):
            out = np.asarray([idx])
        elif isinstance(idx, (list, tuple, np.ndarray, jax.Array)):
            out = np.asarray(idx).reshape(-1)
        else:
            raise TypeError(f"unsupported index type {type(idx)}")
        if out.size and (out.min() < -n or out.max() >= n):
            raise IndexError(
                f"row indices out of bounds for {n} rows: "
                f"[{out.min()}, {out.max()}]"
            )
        return np.where(out < 0, out + n, out)

    # -- matmul --------------------------------------------------------------
    def __matmul__(self, x) -> jax.Array:
        x = jnp.asarray(x)
        if x.ndim not in (1, 2):
            raise ValueError(
                f"operand must be 1D or 2D, received {x.ndim}D"
            )
        if x.shape[0] != self.shape[1]:
            raise ValueError(
                f"dimension mismatch: {self.shape} @ {x.shape}"
            )
        n = self.shape[0]
        ell = self._ell_for_view()
        if ell is not None:
            return ell_matvec(ell, x) if x.ndim == 1 else ell_matmat(ell, x)
        if self.layout == _Layout.CSR:
            fn = ops.csr_matvec if x.ndim == 1 else ops.csr_matmat
        else:
            fn = ops.csc_matvec if x.ndim == 1 else ops.csc_matmat
        return fn(self.values, self.indptr, self.indices, x, n)

    def _ell_for_view(self):
        """Hybrid-ELL pytree for THIS view's forward matmul, or None when
        the ELL path is off / the buffers are abstract (inside a trace the
        host-side conversion can't run — fall back to segment-sum)."""
        if not _ell_enabled() or isinstance(self.values, jax.core.Tracer):
            return None
        key = "B" if self.layout == _Layout.CSR else "BT"
        if key not in self._ell_cache:
            import scipy.sparse as sp_

            major = (
                self.shape[0] if self.layout == _Layout.CSR else self.shape[1]
            )
            minor = self.shape[0] + self.shape[1] - major
            B = sp_.csr_matrix(
                (
                    np.asarray(self.values),
                    np.asarray(self.indices),
                    np.asarray(self.indptr),
                ),
                shape=(major, minor),
            )
            if key == "BT":
                B = B.T.tocsr()
            self._ell_cache[key] = csr_to_ell(B.data, B.indptr, B.indices)
        return self._ell_cache[key]

    def __rmatmul__(self, x) -> jax.Array:
        x = jnp.asarray(x)
        if x.ndim == 1:
            if x.shape[0] != self.shape[0]:
                raise ValueError(
                    f"dimension mismatch: {x.shape} @ {self.shape}"
                )
            return self.T @ x
        if x.ndim == 2:
            if x.shape[1] != self.shape[0]:
                raise ValueError(
                    f"dimension mismatch: {x.shape} @ {self.shape}"
                )
            return (self.T @ x.T).T
        raise ValueError(f"operand must be 1D or 2D, received {x.ndim}D")

    def __repr__(self):
        return (
            f"{type(self).__name__}(shape={self.shape}, nnz={self.nnz}, "
            f"layout={self.layout.name}, dtype={self.dtype})"
        )


class SparseCSRTensor(_SparseTensor):
    """User-facing CSR tensor: from scipy csr_matrix/csr_array or raw buffers."""

    def __init__(self, arg, indices=None, indptr=None, shape=None):
        try:
            import scipy.sparse as sp

            is_scipy = sp.issparse(arg)
        except ImportError:
            is_scipy = False
        if is_scipy:
            src = _SparseTensor.from_scipy(arg.tocsr())
            super().__init__(
                src.values, src.indices, src.indptr, src.shape, _Layout.CSR
            )
            return
        _is_array(jnp.asarray(arg), "values")
        if indices is None or indptr is None or shape is None:
            raise TypeError(
                "SparseCSRTensor requires either a scipy CSR matrix or "
                "(values, indices, indptr, shape)"
            )
        super().__init__(arg, indices, indptr, shape, _Layout.CSR)
