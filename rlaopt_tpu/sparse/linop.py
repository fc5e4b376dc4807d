"""Sparse tensor → matrix-free operator adapter.

Reference users hand ``SparseCSRTensor`` data matrices straight to solve
loops through ``@``/``__rmatmul__`` (``rlaopt/sparse/sparse_tensor.py:114-126``).
Here the same surface is a :class:`~rlaopt_tpu.linops.TwoSidedLinOp` whose
payload is either the compressed triplet (CPU: native C++ kernels) or a
two-sided hybrid ELL pytree (accelerators: gather + VPU reduce, no scatter
— see :mod:`rlaopt_tpu.sparse.ell`), so a sparse matrix drops into every
consumer of the operator API (``LstSq``/``LSQR``/``SkPre``, sketches,
sharded wrappers) and traces into jitted solver loops like any other linop.

Both apply directions are precomputed at construction: the forward ELL pads
A's rows, the adjoint ELL pads Aᵀ's rows (built once host-side via scipy),
so ``A @ x`` and ``A.T @ y`` are BOTH scatter-free on the accelerator. The
triplet path instead reuses the zero-copy transpose identity (CSR read as
CSC is Aᵀ) on the same three buffers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .ell import csr_to_ell, ell_matmat, ell_matvec, ELL_WIDTH_ALIGN
from .sparse_tensor import _Layout, _SparseTensor
from ..linops.base import TwoSidedLinOp


__all__ = ["sparse_aslinop", "sparse_shard_rows"]


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


def _twosided_ell(sp: _SparseTensor, width=None):
    """{"fwd": ELL(A), "adj": ELL(Aᵀ)} from a sparse tensor (host-side)."""
    A = sp.to_scipy().tocsr()
    At = A.T.tocsr()
    return {
        "fwd": csr_to_ell(A.data, A.indptr, A.indices, width=width),
        "adj": csr_to_ell(At.data, At.indptr, At.indices, width=width),
    }


# Auto-densify budget: dense payload elements (not bytes). 2^28 f32 = 1 GiB.
_DENSE_BUDGET = 1 << 28


def sparse_aslinop(sp: _SparseTensor, impl: str = "auto") -> TwoSidedLinOp:
    """Wrap a sparse CSR/CSC tensor as a two-sided matrix-free operator.

    Args:
        sp: the sparse tensor.
        impl: ``"ell"`` (hybrid ELL payload, scatter-free applies),
            ``"dense"`` (materialize and ride the MXU), ``"triplet"``
            (raw CSR/CSC buffers through :mod:`rlaopt_tpu.sparse.ops` —
            native C++ on the CPU backend), or ``"auto"``: triplet on the
            CPU backend; on accelerators, dense when the materialized
            matrix fits a 1 GiB budget, ELL otherwise.

    TPU note (measured, round 3): the accelerator has no hardware gather —
    XLA lowers per-element random access to ~1.6-2.2 GB/s regardless of
    table size. For the tall-skinny data matrices sparse solvers actually
    see (e.g. 100k×1k least squares), a densified operand streams the MXU
    at HBM bandwidth and beats every sparse formulation by >20x; sparsity
    on TPU pays only when the dense form cannot be stored. ``auto``
    encodes exactly that rule.
    """
    if not isinstance(sp, _SparseTensor):
        raise TypeError(
            f"expected a sparse tensor, got {type(sp).__name__}"
        )
    if impl not in ("auto", "ell", "dense", "triplet", "laned"):
        raise ValueError(
            f"impl must be auto|ell|dense|triplet|laned, got {impl!r}"
        )
    if impl == "auto":
        if jax.default_backend() == "cpu":
            impl = "triplet"
        elif sp.shape[0] * sp.shape[1] <= _DENSE_BUDGET:
            impl = "dense"
        else:
            impl = "ell"
    m, n = sp.shape

    if impl == "dense":
        from ..linops.base import aslinop

        return aslinop(sp.todense())

    if impl == "laned":
        from .laned import csr_to_laned, laned_matmat, laned_matvec

        A = sp.to_scipy().tocsr()
        At = A.T.tocsr()
        data = {
            "fwd": csr_to_laned(A.data, A.indptr, A.indices, n),
            "adj": csr_to_laned(At.data, At.indptr, At.indices, m),
        }
        return TwoSidedLinOp(
            (m, n),
            lambda d, x: laned_matvec(d["fwd"], x, m),
            lambda d, x: laned_matvec(d["adj"], x, n),
            matmat=lambda d, X: laned_matmat(d["fwd"], X, m),
            rmatmat=lambda d, X: laned_matmat(d["adj"], X, n),
            dtype=sp.dtype,
            data=data,
        )

    if impl == "ell":
        data = _twosided_ell(sp)
        return TwoSidedLinOp(
            (m, n),
            lambda d, x: ell_matvec(d["fwd"], x),
            lambda d, x: ell_matvec(d["adj"], x),
            matmat=lambda d, X: ell_matmat(d["fwd"], X),
            rmatmat=lambda d, X: ell_matmat(d["adj"], X),
            dtype=sp.dtype,
            data=data,
        )

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


def sparse_shard_rows(
    sp: _SparseTensor, mesh, axis: str = "i", impl: str = "auto"
):
    """Row-partition a sparse CSR tensor over a mesh as a ShardedLinOp.

    The distributed analog of handing a ``SparseCSRTensor`` to a solve loop:
    rows are split into contiguous chunks (the reference's ``torch.chunk``
    semantics, ``rlaopt/kernels/base.py:297-302``), each chunk becomes a
    two-sided ELL payload (forward pads the chunk's rows, adjoint pads the
    chunk-transpose's rows — scatter-free in both directions, see
    :mod:`rlaopt_tpu.sparse.ell`), and the chunks compose through
    :meth:`ShardedLinOp.from_local_ops` — forward matvec gathers local
    products, adjoint matvec psums partials across the mesh.

    ELL padding composes with ``from_local_ops``'s generic zero-padding by
    construction: a zero-padded ELL row/slot is (index 0, value 0), which
    gathers ``x[0]`` and multiplies by zero — ragged chunks and unequal
    widths are both harmless. Each chunk's ELL width covers its longest
    row (no COO spill), keeping every chunk's pytree structure identical
    as ``from_local_ops`` requires.

    ``impl``: ``"auto"`` densifies each chunk onto the MXU when the chunk
    fits the same 1 GiB budget as :func:`sparse_aslinop` (the TPU-measured
    rule: sparsity pays only when dense cannot be stored) and uses ELL
    beyond it; ``"ell"``/``"dense"`` force a path. All chunks take the
    SAME path — ``from_local_ops`` requires identical pytree structure.
    """
    from ..linops.sharded import ShardedLinOp
    from ..parallel.distributed import axis_size

    if not isinstance(sp, _SparseTensor):
        raise TypeError(
            f"expected a sparse tensor, got {type(sp).__name__}"
        )
    if sp.layout != _Layout.CSR:
        raise ValueError(
            "sparse_shard_rows needs CSR layout (row slicing); "
            "transpose a CSC tensor first (.T is zero-copy)"
        )
    if impl not in ("auto", "ell", "dense"):
        raise ValueError(f"impl must be auto|ell|dense, got {impl!r}")
    m, n = sp.shape
    ndev = axis_size(mesh, axis)
    chunk = -(-m // ndev)
    if chunk == 0:
        raise ValueError(f"cannot split {m} rows over {ndev} devices")
    bounds = [(i * chunk, min((i + 1) * chunk, m)) for i in range(ndev)]
    if any(s >= e for s, e in bounds):
        raise ValueError(
            f"{m} rows over {ndev} devices leaves empty shards; "
            "use a smaller mesh axis"
        )
    if impl == "auto":
        impl = "dense" if chunk * n <= _DENSE_BUDGET else "ell"

    A = sp.to_scipy().tocsr()
    if impl == "dense":

        # HIGHEST precision like aslinop: the default f32 matmul runs bf16
        # passes on TPU, degrading data-operator accuracy (linops/base.py).
        def mv_dense(d, x):
            return jnp.matmul(
                d["D"], x, precision=jax.lax.Precision.HIGHEST
            )

        def rmv_dense(d, x):
            return jnp.matmul(
                d["D"].T, x, precision=jax.lax.Precision.HIGHEST
            )

        local_ops = [
            TwoSidedLinOp(
                (e - s, n), mv_dense, rmv_dense, dtype=sp.dtype,
                data={"D": jnp.asarray(A[s:e].toarray())},
            )
            for s, e in bounds
        ]
        return ShardedLinOp.from_local_ops(
            local_ops, mesh, mode="row", axis=axis
        )

    local_ops = []
    for s, e in bounds:
        blk = A[s:e]
        blk_t = blk.T.tocsr()
        counts = np.diff(blk.indptr)
        counts_t = np.diff(blk_t.indptr)
        w = -(-max(int(counts.max(initial=0)), 1) // ELL_WIDTH_ALIGN)
        w_t = -(-max(int(counts_t.max(initial=0)), 1) // ELL_WIDTH_ALIGN)
        data = {
            "fwd": csr_to_ell(
                blk.data, blk.indptr, blk.indices, width=w * ELL_WIDTH_ALIGN
            ),
            "adj": csr_to_ell(
                blk_t.data, blk_t.indptr, blk_t.indices,
                width=w_t * ELL_WIDTH_ALIGN,
            ),
        }

        # ShardedLinOp drives 1-D and 2-D operands through the same local
        # function, so dispatch on rank here.
        def mv_any(d, x):
            return (
                ell_matvec(d["fwd"], x) if x.ndim == 1
                else ell_matmat(d["fwd"], x)
            )

        def rmv_any(d, x):
            return (
                ell_matvec(d["adj"], x) if x.ndim == 1
                else ell_matmat(d["adj"], x)
            )

        local_ops.append(
            TwoSidedLinOp(
                (e - s, n), mv_any, rmv_any, dtype=sp.dtype, data=data
            )
        )
    return ShardedLinOp.from_local_ops(local_ops, mesh, mode="row", axis=axis)
