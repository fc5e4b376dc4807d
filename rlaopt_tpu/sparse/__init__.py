"""Sparse CSR/CSC tensors with native CPU kernels + TPU XLA formulations."""

from .sparse_tensor import SparseCSRTensor, _SparseTensor, _Layout  # noqa: F401
from .ops import (  # noqa: F401
    csc_matmat,
    csc_matvec,
    csr_matmat,
    csr_matvec,
    gather_rows,
)
from .native import native_available  # noqa: F401
from .ell import csr_to_ell, ell_matmat, ell_matvec  # noqa: F401
from .linop import sparse_aslinop, sparse_shard_rows  # noqa: F401

__all__ = [
    "SparseCSRTensor",
    "sparse_aslinop",
    "sparse_shard_rows",
    "csr_to_ell",
    "ell_matvec",
    "ell_matmat",
    "csr_matvec",
    "csr_matmat",
    "csc_matvec",
    "csc_matmat",
    "gather_rows",
    "native_available",
]
