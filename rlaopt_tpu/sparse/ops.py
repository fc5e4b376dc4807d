"""Sparse matvec/matmat/row-slice ops with XLA and native backends.

The reference's op layer (``rlaopt/sparse/ops.py:7-59`` over the C++/CUDA
kernels of ``csrc/``). TPU-first formulation:

* **Accelerator path** — no atomics on TPU, so the CUDA scatter-with-atomics
  kernels (``csrc/cuda/csc_matvec.cu:24``) are recast as XLA ``segment_sum``
  (CSR, gather form) and ``.at[].add`` scatter-add (CSC) — both lower to
  sorted/one-hot formulations XLA schedules well on the MXU/VPU.
* **CPU path** — the native OpenMP kernels in ``csrc/sparse_ops.cc``
  (XLA FFI custom calls), mirroring the reference's CPU extension.
* ``impl="auto"`` uses native on the CPU backend when built, XLA otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .native import TARGET_PREFIX, native_available


__all__ = [
    "csr_matvec",
    "csr_matmat",
    "csc_matvec",
    "csc_matmat",
    "gather_rows",
]


def _use_native(impl: str) -> bool:
    if impl == "native":
        if not native_available():
            raise RuntimeError("native sparse kernels unavailable")
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "cpu" and native_available()


def _entry_segments(indptr: jax.Array, nnz: int) -> jax.Array:
    """Per-entry segment id (row id for CSR indptr, col id for CSC)."""
    return (
        jnp.searchsorted(indptr, jnp.arange(nnz), side="right") - 1
    ).astype(jnp.int32)


# -- CSR ---------------------------------------------------------------------
def csr_matvec(values, indptr, indices, x, n_rows: int, impl: str = "auto"):
    """y = A @ x for CSR A."""
    if _use_native(impl):
        return jax.ffi.ffi_call(
            TARGET_PREFIX + "csr_matvec",
            jax.ShapeDtypeStruct((n_rows,), values.dtype),
        )(values, indptr, indices, x)
    rows = _entry_segments(indptr, values.shape[0])
    return jax.ops.segment_sum(
        values * x[indices], rows, num_segments=n_rows
    )


def csr_matmat(values, indptr, indices, X, n_rows: int, impl: str = "auto"):
    """Y = A @ X for CSR A, X (m, k)."""
    if _use_native(impl):
        return jax.ffi.ffi_call(
            TARGET_PREFIX + "csr_matmat",
            jax.ShapeDtypeStruct((n_rows, X.shape[1]), values.dtype),
        )(values, indptr, indices, X)
    rows = _entry_segments(indptr, values.shape[0])
    return jax.ops.segment_sum(
        values[:, None] * X[indices], rows, num_segments=n_rows
    )


# -- CSC ---------------------------------------------------------------------
def csc_matvec(values, indptr, row_idx, x, n_rows: int, impl: str = "auto"):
    """y = A @ x for CSC A (indptr over columns, row_idx per entry)."""
    if _use_native(impl):
        return jax.ffi.ffi_call(
            TARGET_PREFIX + "csc_matvec",
            jax.ShapeDtypeStruct((n_rows,), values.dtype),
        )(values, indptr, row_idx, x)
    cols = _entry_segments(indptr, values.shape[0])
    out = jnp.zeros((n_rows,), dtype=values.dtype)
    return out.at[row_idx].add(values * x[cols])


def csc_matmat(values, indptr, row_idx, X, n_rows: int, impl: str = "auto"):
    """Y = A @ X for CSC A, X (m, k)."""
    if _use_native(impl):
        return jax.ffi.ffi_call(
            TARGET_PREFIX + "csc_matmat",
            jax.ShapeDtypeStruct((n_rows, X.shape[1]), values.dtype),
        )(values, indptr, row_idx, X)
    cols = _entry_segments(indptr, values.shape[0])
    out = jnp.zeros((n_rows, X.shape[1]), dtype=values.dtype)
    return out.at[row_idx].add(values[:, None] * X[cols])


# -- row slicing -------------------------------------------------------------
def gather_rows(values, indptr, indices, sel, impl: str = "auto"):
    """CSR row gather: returns (new_values, new_indices, new_indptr).

    Output nnz is data-dependent, so this op is host-driven (eager), like the
    reference's ``get_row_slice`` (``csrc/cpp/row_slice.cpp:9-93``).
    """
    indptr_np = np.asarray(indptr)
    sel_np = np.asarray(sel)
    counts = indptr_np[sel_np + 1] - indptr_np[sel_np]
    new_indptr = np.zeros(len(sel_np) + 1, dtype=indptr_np.dtype)
    np.cumsum(counts, out=new_indptr[1:])
    nnz2 = int(new_indptr[-1])

    if _use_native(impl):
        sel_arr = jnp.asarray(sel_np.astype(indptr_np.dtype))
        new_indptr_arr = jnp.asarray(new_indptr)
        out_v, out_c = jax.ffi.ffi_call(
            TARGET_PREFIX + "gather_rows",
            (
                jax.ShapeDtypeStruct((nnz2,), values.dtype),
                jax.ShapeDtypeStruct((nnz2,), indices.dtype),
            ),
        )(values, indices, indptr, sel_arr, new_indptr_arr)
        return out_v, out_c, new_indptr_arr

    # numpy fallback: build flat gather indices
    starts = indptr_np[sel_np]
    flat = np.repeat(starts - new_indptr[:-1], counts) + np.arange(
        nnz2, dtype=indptr_np.dtype
    )
    flat_j = jnp.asarray(flat)
    return values[flat_j], indices[flat_j], jnp.asarray(new_indptr)
