"""Sparse tensor → matrix-free operator adapter.

Reference users hand ``SparseCSRTensor`` data matrices straight to solve
loops through ``@``/``__rmatmul__`` (``rlaopt/sparse/sparse_tensor.py:114-126``).
Here the same surface is a :class:`~rlaopt_tpu.linops.TwoSidedLinOp` whose
payload is the compressed index triplet, so a sparse matrix drops into every
consumer of the operator API (``LstSq``/``LSQR``/``SkPre``, sketches,
sharded wrappers) and traces into jitted solver loops like any other linop.

The adjoint reuses the zero-copy transpose identity: the CSR triplet of A
read as CSC *is* Aᵀ (and vice versa), so both directions run on the same
three buffers with no conversion.
"""

import jax.numpy as jnp

from . import ops
from .sparse_tensor import _Layout, _SparseTensor
from ..linops.base import TwoSidedLinOp


__all__ = ["sparse_aslinop"]


def _csr_fns(m: int, n: int):
    def mv(d, x):
        return ops.csr_matvec(d["values"], d["indptr"], d["indices"], x, m)

    def mm(d, X):
        return ops.csr_matmat(d["values"], d["indptr"], d["indices"], X, m)

    def rmv(d, x):
        return ops.csc_matvec(d["values"], d["indptr"], d["indices"], x, n)

    def rmm(d, X):
        return ops.csc_matmat(d["values"], d["indptr"], d["indices"], X, n)

    return mv, rmv, mm, rmm


def _csc_fns(m: int, n: int):
    def mv(d, x):
        return ops.csc_matvec(d["values"], d["indptr"], d["indices"], x, m)

    def mm(d, X):
        return ops.csc_matmat(d["values"], d["indptr"], d["indices"], X, m)

    def rmv(d, x):
        return ops.csr_matvec(d["values"], d["indptr"], d["indices"], x, n)

    def rmm(d, X):
        return ops.csr_matmat(d["values"], d["indptr"], d["indices"], X, n)

    return mv, rmv, mm, rmm


def sparse_aslinop(sp: _SparseTensor) -> TwoSidedLinOp:
    """Wrap a sparse CSR/CSC tensor as a two-sided matrix-free operator.

    The operator's pytree payload holds the (values, indices, indptr)
    triplet; applications dispatch to :mod:`rlaopt_tpu.sparse.ops` (XLA
    segment-sum / scatter-add on accelerators, native C++ on the CPU
    backend) and are jit/scan-safe.
    """
    if not isinstance(sp, _SparseTensor):
        raise TypeError(
            f"expected a sparse tensor, got {type(sp).__name__}"
        )
    m, n = sp.shape
    fns = _csr_fns if sp.layout == _Layout.CSR else _csc_fns
    mv, rmv, mm, rmm = fns(m, n)
    data = {
        "values": jnp.asarray(sp.values),
        "indices": jnp.asarray(sp.indices),
        "indptr": jnp.asarray(sp.indptr),
    }
    return TwoSidedLinOp(
        (m, n), mv, rmv, matmat=mm, rmatmat=rmm, dtype=sp.dtype, data=data
    )
