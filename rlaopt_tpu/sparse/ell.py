"""Padded ELL (+ COO overflow) representation: the TPU-fast sparse format.

The reference's accelerator path scatters with atomics
(``rlaopt/csrc/cuda/csc_matvec.cu:24``); TPUs have no atomics and XLA
lowers scatter/segment-sum to a serialized per-index loop, which is slow
enough at solver scale (16M nnz) to trip the runtime's execution watchdog.
The TPU-native formulation is the classic hybrid ELL+COO (cuSPARSE "HYB"):

* rows are padded to a common width ``w`` → values/indices become dense
  ``(n_rows, w)`` arrays, and ``A @ x`` is ONE dense gather ``x[idx]`` plus
  a VPU multiply-reduce — bandwidth-bound, no scatter on the forward path;
* rows longer than ``w`` spill their tail into a tiny COO remainder that
  goes through the ordinary scatter-add (cheap when it holds <<1% of nnz).

Conversion runs host-side in numpy once per operator (the reference
likewise converts formats eagerly, ``rlaopt/sparse/sparse_tensor.py:58``);
the applies are jit/scan-safe pure functions over the padded pytree.

Padding convention: padded slots carry ``index 0, value 0`` — they gather
``x[0]`` and multiply by zero, contributing nothing while keeping every
lane shape-static for XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np


__all__ = ["csr_to_ell", "ell_matvec", "ell_matmat", "ELL_WIDTH_ALIGN"]

ELL_WIDTH_ALIGN = 8  # pad widths to a lane-friendly multiple


def _round_up(x: int, k: int) -> int:
    return -(-int(x) // k) * k


def csr_to_ell(values, indptr, indices, width: int | None = None,
               spill_quantile: float = 0.995, max_pad_ratio: float = 4.0):
    """Host-side CSR → hybrid ELL(+COO) conversion.

    Args:
        values/indptr/indices: CSR triplet (any array-likes; read eagerly).
        width: force the ELL width. Default: the smallest aligned width that
            keeps the pad ratio (padded slots / nnz) under ``max_pad_ratio``,
            starting from the ``spill_quantile`` row-length quantile —
            skew-robust: one 100k-long row doesn't blow up storage.
        spill_quantile / max_pad_ratio: width-selection knobs (see above).

    Returns:
        dict pytree with
            ``ell_values``  (n_rows, w) same dtype as values,
            ``ell_indices`` (n_rows, w) int32,
        and, only when rows spill past ``w``,
            ``coo_values`` (s,), ``coo_rows`` (s,) int32, ``coo_cols`` (s,).
    """
    values = np.asarray(values)
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    n_rows = indptr.shape[0] - 1
    counts = indptr[1:] - indptr[:-1]
    max_cnt = int(counts.max()) if n_rows else 0

    if width is None:
        width = _round_up(max(int(max_cnt), 1), ELL_WIDTH_ALIGN)
        if n_rows and values.size:
            q = _round_up(
                max(int(np.quantile(counts, spill_quantile)), 1),
                ELL_WIDTH_ALIGN,
            )
            # Prefer the FULL max-row width when it pads acceptably (no COO
            # spill at all); fall back to the skew-robust quantile width
            # when the full width would pad more than max_pad_ratio× the
            # true nnz (one 100k-long row must not blow up storage). If
            # even the quantile width exceeds the budget, take it anyway —
            # it is the least-padded option that still bounds the spill.
            if width * n_rows > max_pad_ratio * max(values.size, 1):
                width = q
    width = max(int(width), 1)

    ell_v = np.zeros((n_rows, width), dtype=values.dtype)
    ell_i = np.zeros((n_rows, width), dtype=np.int32)
    kept = np.minimum(counts, width)
    # flat positions of the kept (row, slot) pairs
    rows_rep = np.repeat(np.arange(n_rows), kept)
    slots = np.arange(len(rows_rep)) - np.repeat(
        np.cumsum(kept) - kept, kept
    )
    src = np.repeat(indptr[:-1], kept) + slots
    ell_v[rows_rep, slots] = values[src]
    ell_i[rows_rep, slots] = indices[src]

    out = {
        "ell_values": jnp.asarray(ell_v),
        "ell_indices": jnp.asarray(ell_i),
    }
    spill = counts - kept
    if int(spill.sum()):
        rows_s = np.repeat(np.arange(n_rows), spill).astype(np.int32)
        slots_s = np.arange(len(rows_s)) - np.repeat(
            np.cumsum(spill) - spill, spill
        )
        src_s = np.repeat(indptr[:-1] + kept, spill) + slots_s
        out["coo_values"] = jnp.asarray(values[src_s])
        out["coo_rows"] = jnp.asarray(rows_s)
        out["coo_cols"] = jnp.asarray(indices[src_s].astype(np.int32))
    return out


@jax.jit
def ell_matvec(ell, x):
    """y = A @ x from the hybrid ELL pytree. One gather, zero scatters on
    the ELL part; the COO spill (if any) is a small scatter-add."""
    y = jnp.sum(ell["ell_values"] * x[ell["ell_indices"]], axis=1)
    if "coo_values" in ell:
        y = y.at[ell["coo_rows"]].add(
            ell["coo_values"] * x[ell["coo_cols"]]
        )
    return y


@jax.jit
def ell_matmat(ell, X):
    """Y = A @ X, column-sequential (lax.map) so peak memory stays at one
    (n_rows, w) gather regardless of the RHS width."""
    Yt = jax.lax.map(lambda col: ell_matvec(ell, col), X.T)
    return Yt.T
