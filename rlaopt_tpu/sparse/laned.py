"""Lane-aligned sparse format: vector-rate SpMV for LARGE column spaces.

The hybrid ELL path (:mod:`rlaopt_tpu.sparse.ell`) is scatter-free but its
inner op — ``x[indices]`` with arbitrary indices — lowers to ~2 GB/s on
TPU (no hardware gather; measured round 3, see benchmarks/RESULTS_r3.md).
Densifying fixes small column spaces; this module is the large-``m``
answer.

The one vectorized lookup TPUs *do* have is Mosaic's ``tpu.dynamic_gather``
(the ``jnp.take_along_axis`` pattern): ``out[s, l] = table[q[s, l], l]`` —
each lane ``l`` selects any sublane of the same lane column, a whole
128-lane row per issue. It cannot cross lanes, so this format makes lane
crossing unnecessary **at conversion time**:

* reshape ``x`` to a ``(m/128, 128)`` table: element ``g`` lives at
  sublane ``g >> 7``, lane ``g & 127``;
* place each CSR entry in a slot whose LANE EQUALS its column's lane
  ``idx & 127``. Each output row owns ``T`` 128-lane slot rows ("levels");
  an entry goes to the first level where its lane is still free;
* entries that exhaust all ``T`` levels (rare lane collisions) spill to a
  small COO remainder handled outside the kernel.

The matvec kernel is then: one ``dynamic_gather`` per slot block (table
resident in VMEM), a multiply, and a STATIC reshape-sum over each row's
``T×128`` slots — no scatter, no per-element addressing anywhere.

Cost model: padded slots = n·T·128 vs nnz useful — memory trades at
``T·128/w̄``× nnz (w̄ = mean row length) for compute at HBM streaming rate.
The conversion picks the smallest ``T`` that keeps the spill tiny, so the
trade is explicit and bounded. Conversion is host-side numpy, once per
operator, like the reference's eager format conversions
(``rlaopt/sparse/sparse_tensor.py:58``).

**Measured Mosaic limit (round 3, on-chip):** ``tpu.dynamic_gather``
requires the gather SOURCE to be a single vreg along the gather
dimension — "Not implemented: Multiple source vregs along gather
dimension" at an (8192, 128) table. The x-table may therefore hold at
most 8 sublanes: **n_cols ≤ 8·128 = 1024 on real TPU hardware**. At such
column spaces the auto-densify dispatch already rides the MXU dense and
wins outright, so this format is an EXPERIMENTAL study artifact: it
documents exactly where the TPU's one vectorized-lookup primitive stops,
and remains exercised through the CPU interpret path. Large-m
unstructured SpMV on TPU stays at the per-element gather rate
(~2 GB/s, see the round-3 gather study) — the measured reason the
dispatch densifies whenever the matrix fits.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


__all__ = ["csr_to_laned", "laned_matvec", "laned_matmat", "LANE"]

LANE = 128


def csr_to_laned(values, indptr, indices, n_cols: int,
                 max_levels: int = 8, spill_target: float = 1e-3):
    """Host-side CSR → lane-aligned conversion.

    Returns a dict pytree:
        ``q``      (n_rows·T, LANE) int32 — x-table sublane per slot
                   (level-major within each output row; padded slots are
                   (sublane 0, value 0)),
        ``v``      (n_rows·T, LANE) float — slot values,
    plus, when some rows overflow all T levels,
        ``coo_values``/``coo_rows``/``coo_cols``,
    and static ints (NOT pytree leaves — recovered from shapes):
        T = q.shape[0] // n_rows, table sublanes S = ceil(n_cols/LANE).
    """
    values = np.asarray(values)
    indptr = np.asarray(indptr).astype(np.int64)
    indices = np.asarray(indices).astype(np.int64)
    n_rows = indptr.shape[0] - 1
    nnz = values.shape[0]

    rows = np.repeat(np.arange(n_rows, dtype=np.int64),
                     indptr[1:] - indptr[:-1])
    lanes = indices & (LANE - 1)
    subl = (indices >> 7).astype(np.int32)

    # level of each entry = its rank within the (row, lane) group
    key = rows * LANE + lanes
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
    level_s = np.arange(nnz, dtype=np.int64) - np.repeat(
        starts, np.diff(np.r_[starts, nnz])
    )
    level = np.empty(nnz, dtype=np.int64)
    level[order] = level_s

    # smallest T with spill under target (bounded by max_levels)
    if nnz:
        for T in range(1, max_levels + 1):
            if (level >= T).sum() <= spill_target * nnz:
                break
    else:
        T = 1

    keep = level < T
    q = np.zeros((n_rows * T, LANE), dtype=np.int32)
    v = np.zeros((n_rows * T, LANE), dtype=values.dtype)
    slot_r = rows[keep] * T + level[keep]
    slot_l = lanes[keep]
    q[slot_r, slot_l] = subl[keep]
    v[slot_r, slot_l] = values[keep]

    out = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
    if (~keep).any():
        out["coo_values"] = jnp.asarray(values[~keep])
        out["coo_rows"] = jnp.asarray(rows[~keep].astype(np.int32))
        out["coo_cols"] = jnp.asarray(indices[~keep].astype(np.int32))
    return out


def _laned_kernel(x2_ref, q_ref, v_ref, o_ref, *, T: int, reps: int):
    table = x2_ref[...]                      # (S, LANE) — full x, in VMEM
    S = table.shape[0]
    ps = []
    for t in range(reps):                    # one table-shaped gather each
        qb = q_ref[t * S:(t + 1) * S, :]
        vb = v_ref[t * S:(t + 1) * S, :]
        g = jnp.take_along_axis(
            table, qb, axis=0, mode="promise_in_bounds"
        )
        ps.append(vb * g)
    p = ps[0] if reps == 1 else jnp.concatenate(ps, axis=0)
    # T | S·reps by construction: every row's T levels sit in this block
    o_ref[...] = jnp.sum(p.reshape(-1, T * LANE), axis=1)


def laned_matvec(laned, x, n_rows: int, *, interpret: bool | None = None):
    """y = A @ x from the lane-aligned pytree (jit/scan-safe).

    The table (all of x) stays resident in VMEM across the grid.
    ``dynamic_gather``'s shape rule makes each gather exactly table-sized
    (S sublane rows), so one grid step processes ``reps`` table-sized slot
    blocks, with ``reps`` chosen so (a) each row's T levels never straddle
    a block boundary (T | S·reps) and (b) the q/v block stays a few MB.
    """
    import math

    from jax.experimental import pallas as pl

    if interpret is None:  # no Mosaic on the CPU backend — interpret there
        interpret = jax.default_backend() == "cpu"
    q, v = laned["q"], laned["v"]
    if not interpret and x.shape[0] > 8 * LANE:
        raise ValueError(
            "laned_matvec: Mosaic's tpu.dynamic_gather reads from a single "
            "vreg along the gather dimension, so the x-table is limited to "
            f"8 sublanes — n_cols <= {8 * LANE} on TPU (got {x.shape[0]}). "
            "Use the ELL path or the auto-densify dispatch "
            "(sparse_aslinop(impl='auto')) for larger column spaces."
        )
    total = q.shape[0]                        # n_rows * T
    T = total // n_rows
    m = x.shape[0]
    # table sublanes padded to a multiple of 8 (Mosaic block shapes must
    # tile as (8k, 128); padded sublanes are never addressed by q)
    s0 = -(-m // LANE)
    S = -(-s0 // 8) * 8
    pad = S * LANE - m
    x2 = jnp.pad(x, (0, pad)).reshape(S, LANE)

    # rep multiple aligning blocks with BOTH constraints: every row's T
    # levels inside one block (T | step_rows) and a lane-tileable output
    # block (128 | step_rows/T) → step_rows ≡ 0 (mod 128·T).
    unit = (128 * T) // math.gcd(S, 128 * T)
    reps = unit
    target_rows = max(1, (4 << 20) // (LANE * 8))  # ~4 MB of q+v per step
    while S * reps * 2 <= target_rows and S * reps < total:
        reps *= 2

    step_rows = S * reps
    total_pad = -(-total // step_rows) * step_rows
    if total_pad != total:  # zero slots gather x2[0] and multiply by 0
        q = jnp.pad(q, ((0, total_pad - total), (0, 0)))
        v = jnp.pad(v, ((0, total_pad - total), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_laned_kernel, T=T, reps=reps),
        grid=(total_pad // step_rows,),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda i: (0, 0)),
            pl.BlockSpec((step_rows, LANE), lambda i: (i, 0)),
            pl.BlockSpec((step_rows, LANE), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((step_rows // T,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((total_pad // T,), x.dtype),
        interpret=interpret,
    )(x2, q, v)
    y = out[:n_rows]

    if "coo_values" in laned:
        y = y.at[laned["coo_rows"]].add(
            laned["coo_values"] * x[laned["coo_cols"]]
        )
    return y


def laned_matmat(laned, X, n_rows: int, *, interpret: bool | None = None):
    """Y = A @ X, column-sequential (lax.map): peak memory stays at one
    table + one slot sweep per RHS column."""
    Yt = jax.lax.map(
        lambda col: laned_matvec(laned, col, n_rows, interpret=interpret),
        X.T,
    )
    return Yt.T
