"""Fused blockwise kernel-Gram matvec — Pallas TPU kernel.

The performance-critical replacement for the reference's KeOps engine
(SURVEY §2.2 N10). One kernel computes ``out = c·k(X1, X2) @ V`` without the
(n, m) Gram matrix ever leaving VMEM:

* grid = (row tiles × col tiles); the col-tile dimension is sequential and
  accumulates into a VMEM scratch tile, so each (TM, TN) kernel tile lives
  only inside the kernel body;
* squared-distance kernels (RBF / Matérn) compute the cross term on the MXU;
  the squared norms are precomputed OUTSIDE the kernel and streamed as
  (TM, 1)/(1, TN) vectors with the constants folded into the operands, so
  the VPU epilogue is two broadcast subtractions plus the transcendental;
* split-precision operands (bf16 hi/lo pairs) are prepared **outside** the
  kernel, once per operand instead of once per tile visit;
* the Laplace (L1) kernel loops features on the VPU (no matmul form exists);
* inputs are pre-scaled by the lengthscale (ARD included) outside the kernel;
  row/col/feature padding is zero-filled, which is exact: zero features don't
  change distances, padded RHS rows are zero, padded output rows are sliced;
* tile sizes default to the largest (TM, TN) fitting a VMEM budget — the
  TPU analog of the reference's device-query launch-config helper
  (``rlaopt/csrc/cuda/cuda_specific.cu:13-94``, SURVEY N9);
* the dot-path bodies are software-pipelined across column tiles
  (``pipeline=True``): the VPU epilogue (norm fold + transcendental +
  lane-reduce contraction) of tile j-1 issues alongside the MXU cross
  passes of tile j, hiding the ~1.7 ms/16k²-sweep per-element epilogue
  cost under MXU time (see ``_body_pipe`` and
  benchmarks/fixed_cost_probe.py).

``compute_dtype`` selects the cross-term speed/accuracy tier. Accuracy
measured against an f64 oracle (n=m=512, d=256, standardized data);
throughput at n=m=16384, d=256, k=8 on a session whose measured chip matmul
peak was 89.7 TF — each tier's roofline is peak·(d+k)/(passes·d):

=============  =================  =====  ==========  =================
value           rel err vs f64     MXU    TFLOP/s     % of its roofline
                                   passes (counted)
=============  =================  =====  ==========  =================
None (default)  1.1e-7 (exact)     6      15.0        97%
"bf16x3"        3.2e-6             3      22.6        73%
"bfloat16"      1.1e-4             1      34.3        37%
=============  =================  =====  ==========  =================

bf16x3's dropped lo·lo term is ~2⁻¹⁸ of |cross|, so its kernel-value error
scales with the squared-distance magnitude: ~3e-6 on standardized data,
~5e-5 when |cross| reaches ~16 (measured on-chip, d=64 unit-variance).

When ``round_up(passes·d, 128) < passes·round_up(d, 128)`` the multi-pass
cross term is folded into ONE bf16 dot over concatenated operand splits
(see the path-selection comment in :func:`kernel_matmat_pallas`) — at the
KRR-typical d=28 this turns bf16x3's 3 lane-padded passes into one
(measured 2.70 → 1.50 ms per 16k² sweep) and the exact tier's 6 into two
(7.89 → 1.89 ms), at measured-identical accuracy. The RHS contraction
loops only the REAL k columns on the VPU (V is sublane-padded to 8; at
k=1 the padded loop was 8× the needed contraction work).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.functions import scale_inputs


__all__ = [
    "kernel_matmat_pallas",
    "kernel_matvec_symmetric",
    "kernel_pair_matmat",
    "kernel_matmat_symmetric_banded",
    "select_tiles",
]


def normalize_compute_dtype(cd):
    """Canonicalize a user-supplied accuracy-tier spelling.

    Accepts None (exact f32), "bf16x3", and any spelling of bfloat16
    ("bfloat16", "bf16", jnp.bfloat16, np.dtype) — returns one of
    None | "bf16x3" | "bfloat16" or raises ValueError.
    """
    if cd is None or cd == "bf16x3":
        return cd
    if cd in ("bf16", "bfloat16"):
        return "bfloat16"
    try:
        s = str(jnp.dtype(cd))
    except TypeError:
        raise ValueError(f"unsupported compute_dtype {cd!r}") from None
    if s != "bfloat16":
        raise ValueError(f"unsupported compute_dtype {cd!r}")
    return "bfloat16"

_SQRT3 = 3.0**0.5
_SQRT5 = 5.0**0.5

# VMEM budget for tile selection against the ~16 MiB scoped-vmem limit.
# Footprint model (validated against Mosaic's scoped-vmem reports on v5e):
# 2 pipeline stages per streamed block + out, PLUS up to ~3 live (TM, TN)
# f32 kernel-tile intermediates (contraction output, distance/exp-argument
# assembly, transcendental result) — these dominate for large tiles.
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def select_tiles(
    n: int,
    m: int,
    d_p: int,
    k_p: int,
    kind: str,
    compute_dtype,
) -> tuple:
    """Pick (tile_m, tile_n): the largest MXU-aligned tiles whose working set
    fits the VMEM budget (N9 analog — the reference queries device props for
    launch config; here the budget drives block shapes).
    """
    if kind == "laplace":
        # VPU-bound feature loop: measured 2.7× faster at (512, 1024) than
        # the round-1 (256, 256) default (pipeline bubbles amortize).
        return (min(512, _round_up(n, 8)), min(1024, _round_up(m, 128)))
    # Bytes per feature-matrix element as streamed into VMEM:
    # f32 exact = 4; bf16 hi+lo pair = 4; single bf16 = 2.
    in_bytes = 2 if compute_dtype == "bfloat16" else 4
    candidates = [
        (1024, 2048), (1024, 1024), (512, 2048), (512, 1024),
        (512, 512), (256, 512), (256, 256), (128, 256), (128, 128),
        (64, 128), (32, 128), (16, 128), (8, 128),
    ]
    for tm, tn in candidates:
        tm_c = min(tm, _round_up(n, 8))
        tn_c = min(tn, _round_up(m, 128))
        work = (
            # 3x streamed blocks: Mosaic's scoped-vmem accounting exceeded
            # the old double-buffer model at d_p >= 1024 (measured 18.7 MiB
            # actual vs 11.6 modeled for (512, 512) at d_p=1024)
            3 * (
                tm_c * d_p * in_bytes
                + d_p * tn_c * in_bytes
                + tn_c * k_p * 4
                + 2 * tm_c * k_p * 4  # out blocks (hi + lo when compensated)
            )
            + 3 * tm_c * tn_c * 4  # live kernel-tile intermediates
            + 2 * tm_c * k_p * 4  # accumulator scratch (hi + lo)
            + (tm_c * tn_c + k_p * tn_c) * 4  # pipeline kprev/vprev scratch
        )
        if work <= _VMEM_BUDGET_BYTES:
            return (tm_c, tn_c)
    return (8, 128)


def _sqdist_direct(xi, xjT, d_orig):
    """Exact pairwise squared distances by feature-broadcast on the VPU.

    For small d this beats the 128-padded HIGHEST-precision MXU expansion
    (~4× at d≈10) and is exact f32 regardless of runtime excess-precision
    settings. Only the ``d_orig`` real features are visited.
    """
    f32 = jnp.float32
    tm, tn = xi.shape[0], xjT.shape[1]
    # Static unroll: Mosaic cannot lower dynamic_slice on values, and d_orig
    # is a Python int anyway.
    acc = jnp.zeros((tm, tn), dtype=f32)
    for f in range(d_orig):
        diff = xi[:, f : f + 1] - xjT[f : f + 1, :]
        acc = acc + diff * diff
    return acc


def _finish_sqdist(kind, d2):
    """Kernel value from the squared distance (Matérn family + RBF)."""
    if kind == "rbf":
        return jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2)
    if kind == "matern12":
        return jnp.exp(-r)
    if kind == "matern32":
        return (1.0 + _SQRT3 * r) * jnp.exp(-_SQRT3 * r)
    if kind == "matern52":
        return (1.0 + _SQRT5 * r + (5.0 / 3.0) * d2) * jnp.exp(-_SQRT5 * r)
    raise ValueError(f"Unknown kernel kind {kind!r}")


def _finish_dot(kind, cross, hx, hy):
    """Kernel value from the MXU cross term plus precomputed norm vectors.

    The constants are folded into the operands outside the kernel so the
    epilogue is two broadcast subtractions plus the transcendental:
    RBF passes hx = ‖x‖²/2 (cross = x·y, so ``cross − hx − hy = −d²/2``);
    Matérn pre-scales the X operand by 2 and passes hx = ‖x‖²
    (``hx + hy − cross = d²``).
    """
    if kind == "rbf":
        return jnp.exp(cross - hx - hy)
    return _finish_sqdist(kind, jnp.maximum(hx + hy - cross, 0.0))


def _acc_update(acc_ref, k_tile, vt_ref, acc_mode: str):
    """Accumulate ``k_tile @ v`` into the output scratch (V arrives
    TRANSPOSED: ``vt_ref`` is (k_p, tn), row c = RHS column c).

    acc_mode:

    * ("vpu", k_real) — per-RHS-column broadcast-multiply + lane reduction
      on the VPU, exact f32 (~6e-7 worst-entry over 16k columns), looped
      over the k_real REAL columns only (V is sublane-padded to 8; at k=1
      looping the padding costs 8× the contraction's VPU ops — measured
      2.7 → 1.8 ms per 16k² bf16x3 sweep at d=28 from this alone). The MXU
      alternative pads k to the 128-lane width: a k=8 HIGHEST contraction
      costs 6 passes x 16x padding — measured 1.75 ms of the 8.9 ms
      exact-tier matvec at n=m=16384, d=256. Used when k_p <= 16.
    * "highest" — 6-pass MXU; right choice once k_p is lane-sized (k ≳ 128,
      e.g. Nyström sketch matmats) where padding waste vanishes.
    * "split" — manual 3-pass bf16 hi/lo of both operands, ~2⁻¹⁸ relative.
    * "fast" — single bf16 pass, for the bf16 tier.
    """
    f32 = jnp.float32
    vt = vt_ref[:].astype(f32)
    if isinstance(acc_mode, tuple):
        k_real = acc_mode[1]
        for c in range(k_real):
            col = jnp.sum(
                k_tile * vt[c : c + 1, :], axis=1, keepdims=True
            )
            acc_ref[:, c : c + 1] += col
        return
    if acc_mode == "split":
        kh = k_tile.astype(jnp.bfloat16)
        kl = (k_tile - kh.astype(f32)).astype(jnp.bfloat16)
        vh = vt.astype(jnp.bfloat16)
        vl = (vt - vh.astype(f32)).astype(jnp.bfloat16)
        acc_ref[:] += (
            lax.dot_general(kh, vh, _DN_T, preferred_element_type=f32)
            + lax.dot_general(kh, vl, _DN_T, preferred_element_type=f32)
            + lax.dot_general(kl, vh, _DN_T, preferred_element_type=f32)
        )
        return
    precision = lax.Precision.HIGHEST if acc_mode == "highest" else None
    acc_ref[:] += lax.dot_general(
        k_tile,
        vt,
        dimension_numbers=_DN_T,
        preferred_element_type=f32,
        precision=precision,
    )


_DN = (((1,), (0,)), ((), ()))
# k_tile (tm, tn) contracted with V^T (k_p, tn) along tn → (tm, k_p)
_DN_T = (((1,), (1,)), ((), ()))


def _body_exact(
    x_ref, y_ref, hx_ref, hy_ref, v_ref, o_ref, acc_ref, *, kind, nj, acc_mode
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Explicit HIGHEST: the runtime may set --xla_allow_excess_precision,
    # which silently demotes f32 dots to bf16 — ~1e-2 kernel-value noise
    # that stalls CG solves around 1e-2 relative residual.
    cross = lax.dot_general(
        x_ref[:], y_ref[:], _DN,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    _acc_update(
        acc_ref, _finish_dot(kind, cross, hx_ref[:], hy_ref[:]), v_ref, acc_mode
    )

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _body_split(
    xh_ref, xl_ref, yh_ref, yl_ref, hx_ref, hy_ref, v_ref, o_ref, acc_ref,
    *, kind, nj, acc_mode,
):
    """bf16x3: 3 full-rate MXU passes ≈ f32-accurate cross terms.

    The hi/lo bf16 operand pairs are prepared outside the kernel (once per
    operand instead of once per tile visit); the lo·lo term (≤2⁻¹⁸ relative)
    is dropped. Mosaic rejects Precision.HIGH, hence the manual splitting.
    The RHS contraction uses the same small-k VPU lane-reduce as the exact
    tier (acc_mode="vpu"): at k=8 the MXU alternative pads to the 128-lane
    width, and the 3-pass "split" contraction costs 3 such padded passes —
    a pure win to run it on the VPU overlapped with the MXU cross terms.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f32 = jnp.float32
    cross = (
        lax.dot_general(xh_ref[:], yh_ref[:], _DN, preferred_element_type=f32)
        + lax.dot_general(xh_ref[:], yl_ref[:], _DN, preferred_element_type=f32)
        + lax.dot_general(xl_ref[:], yh_ref[:], _DN, preferred_element_type=f32)
    )
    _acc_update(
        acc_ref, _finish_dot(kind, cross, hx_ref[:], hy_ref[:]), v_ref,
        acc_mode,
    )

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _body_bf16(
    x_ref, y_ref, hx_ref, hy_ref, v_ref, o_ref, acc_ref, *, kind, nj, acc_mode
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cross = lax.dot_general(
        x_ref[:], y_ref[:], _DN, preferred_element_type=jnp.float32
    )
    _acc_update(
        acc_ref, _finish_dot(kind, cross, hx_ref[:], hy_ref[:]), v_ref,
        acc_mode,
    )

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _body_direct(
    x_ref, y_ref, v_ref, o_ref, acc_ref, *, kind, nj, d_orig, acc_mode
):
    """Small-d exact path: VPU feature loop, no MXU padding waste."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_tile = _finish_sqdist(kind, _sqdist_direct(x_ref[:], y_ref[:], d_orig))
    _acc_update(acc_ref, k_tile, v_ref, acc_mode)

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pre_tile(kind, cross, hx, hy):
    """Exp-argument / squared-distance tile from the MXU cross term."""
    if kind == "rbf":
        return cross - hx - hy
    return jnp.maximum(hx + hy - cross, 0.0)


def _finish_pre(kind, pre):
    """Kernel values from the deferred pre-tile (see ``_body_pipe``)."""
    if kind == "rbf":
        return jnp.exp(pre)
    return _finish_sqdist(kind, pre)


def _body_pipe(*refs, kind, nj, acc_mode, cross_fn, n_in):
    """Software-pipelined dot-path body: overlap MXU and VPU across tiles.

    The plain bodies serialize per column tile: MXU cross passes, THEN the
    VPU epilogue (norm fold + transcendental + lane-reduce contraction) on
    the same tile — the two units idle alternately, and the epilogue's
    fixed per-element cost (~2.6 ms per 16k² sweep, see
    benchmarks/fixed_cost_probe.py) adds to the cross time. Here the body
    instead applies the epilogue to the PREVIOUS tile's pre-value (held in
    VMEM scratch) while the MXU streams the current tile's cross term —
    the two instruction streams have no data dependence, so Mosaic's
    scheduler can overlap them, hiding the cheaper of the two costs.

    Scratch layout: ``acc`` (tm, k_p) running output, ``kprev`` (tm, tn)
    the previous tile's exp-argument/d² value, ``vprev`` (k_p, tn) the
    previous tile's RHS block. At ``j == 0`` kprev/vprev are zeroed:
    ``finish(0) = 1`` contracted with a zero RHS contributes nothing, so
    the warm-up step is branch-free. The last tile's epilogue runs in the
    ``j == nj-1`` drain step (un-overlapped: 1/nj of the epilogue).
    """
    (*ops, hx_ref, hy_ref, v_ref, o_ref, acc_ref, kprev_ref, vprev_ref) = refs
    assert len(ops) == n_in
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        kprev_ref[:] = jnp.zeros_like(kprev_ref)
        vprev_ref[:] = jnp.zeros_like(vprev_ref)

    cross = cross_fn(ops)
    # Previous tile's epilogue: VPU work with no dependence on `cross`.
    # NOTE (round-5 measurement): gating this off the j == 0 warm-up step
    # (where it computes finish(0)·0) with pl.when costs 30% — 0.988 →
    # 1.280 ms per 16k² d=28 sweep — Mosaic serializes around the
    # conditional and the MXU/VPU overlap collapses. The zero-work warm-up
    # pass is FREE (hidden under the current tile's cross passes); leave
    # it branch-free.
    _acc_update(acc_ref, _finish_pre(kind, kprev_ref[:]), vprev_ref, acc_mode)
    kprev_ref[:] = _pre_tile(kind, cross, hx_ref[:], hy_ref[:])
    vprev_ref[:] = v_ref[:].astype(jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        _acc_update(
            acc_ref, _finish_pre(kind, kprev_ref[:]), vprev_ref, acc_mode
        )
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _cross_exact(ops):
    return lax.dot_general(
        ops[0][:], ops[1][:], _DN,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _cross_split(ops):
    f32 = jnp.float32
    xh, xl, yh, yl = ops
    return (
        lax.dot_general(xh[:], yh[:], _DN, preferred_element_type=f32)
        + lax.dot_general(xh[:], yl[:], _DN, preferred_element_type=f32)
        + lax.dot_general(xl[:], yh[:], _DN, preferred_element_type=f32)
    )


def _cross_bf16(ops):
    return lax.dot_general(
        ops[0][:], ops[1][:], _DN, preferred_element_type=jnp.float32
    )


def _twosum_accumulate(acc_ref, lo_ref, p):
    """Error-free accumulation: acc += p with the rounding error captured.

    Knuth TwoSum (branch-free, exact in f32): after the update,
    ``acc + Σlo`` equals the exact running sum of tile partials to ~2⁻⁴⁸.
    Used by the compensated residual-evaluation path to beat the plain-f32
    accumulation floor across column tiles.
    """
    a = acc_ref[:]
    s = a + p
    z = s - a
    e = (a - (s - z)) + (p - z)
    acc_ref[:] = s
    lo_ref[:] += e


def _body_exact_comp(
    x_ref, y_ref, hx_ref, hy_ref, v_ref, o_ref, olo_ref, acc_ref, lo_ref,
    *, kind, nj,
):
    """Exact tier with compensated cross-tile accumulation (two outputs)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lo_ref[:] = jnp.zeros_like(lo_ref)

    cross = lax.dot_general(
        x_ref[:], y_ref[:], _DN,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    k_tile = _finish_dot(kind, cross, hx_ref[:], hy_ref[:])
    p = lax.dot_general(
        k_tile, v_ref[:].astype(jnp.float32), _DN_T,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    _twosum_accumulate(acc_ref, lo_ref, p)

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        olo_ref[:] = lo_ref[:].astype(olo_ref.dtype)


def _body_direct_comp(
    x_ref, y_ref, v_ref, o_ref, olo_ref, acc_ref, lo_ref, *, kind, nj, d_orig
):
    """Small-d exact path with compensated cross-tile accumulation."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lo_ref[:] = jnp.zeros_like(lo_ref)

    k_tile = _finish_sqdist(kind, _sqdist_direct(x_ref[:], y_ref[:], d_orig))
    p = lax.dot_general(
        k_tile, v_ref[:].astype(jnp.float32), _DN_T,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    _twosum_accumulate(acc_ref, lo_ref, p)

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        olo_ref[:] = lo_ref[:].astype(olo_ref.dtype)


def _body_laplace(
    x_ref, y_ref, v_ref, o_ref, *rest, nj, nb, d_orig, compensated, acc_mode
):
    """Laplace (L1) kernel with a third grid axis over 64-feature blocks.

    No matmul form exists for L1 distances, so the feature loop runs on the
    VPU; blocking the features in the grid keeps the unrolled body small
    (Mosaic rejects multi-hundred-op unrolls) and removes any cap on d. The
    l1 scratch persists across feature steps; the RHS contraction fires once
    per column tile, when the distance sum is complete.
    """
    if compensated:
        o_lo_ref, acc_ref, lo_ref, l1_ref = rest
    else:
        acc_ref, l1_ref = rest
        o_lo_ref = lo_ref = None
    j = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if lo_ref is not None:
            lo_ref[:] = jnp.zeros_like(lo_ref)

    @pl.when(b == 0)
    def _():
        l1_ref[:] = jnp.zeros_like(l1_ref)

    # features beyond d_orig are zero-padded: |0-0| contributes nothing
    xt = x_ref[0] if x_ref.ndim == 3 else x_ref[:]
    l1 = l1_ref[:]
    for f in range(xt.shape[1]):
        l1 = l1 + jnp.abs(xt[:, f : f + 1] - y_ref[f : f + 1, :])
    l1_ref[:] = l1

    @pl.when(b == nb - 1)
    def _():
        k_tile = jnp.exp(-l1_ref[:])
        if compensated:
            p = lax.dot_general(
                k_tile, v_ref[:].astype(jnp.float32), _DN_T,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            _twosum_accumulate(acc_ref, lo_ref, p)
        else:
            _acc_update(acc_ref, k_tile, v_ref, acc_mode)

    @pl.when(jnp.logical_and(j == nj - 1, b == nb - 1))
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        if compensated:
            o_lo_ref[:] = lo_ref[:].astype(o_lo_ref.dtype)


def _laplace_feature_block(d: int) -> int:
    """Feature-block width: the multiple of 8 (≤64) minimizing padded work.

    The L1 feature loop is pure VPU work, so every padded feature costs a
    full (tile_m × tile_n) slab of ops — e.g. d=28 padded to a fixed 64
    would waste 2.3× the required op count; padding to 32 wastes 14%.
    Ties prefer wider blocks (fewer grid steps).
    """
    return min(
        range(8, 72, 8), key=lambda fb: (_round_up(d, fb), -fb)
    )


def _laplace_matmat(
    Xs, Ys, V, tile_m, tile_n, interpret, compensated, acc_mode=None
):
    """Laplace dispatch: 3-axis grid (rows × cols × feature blocks).

    Mosaic requires a block's trailing dim to be 128-divisible or span the
    whole array axis, so the X feature blocks live on a leading array axis:
    X is laid out (nb, n_p, fb) and each grid step reads the full-width
    (1, tile_m, fb) slab — legal for any fb multiple of 8.
    """
    n, d = Xs.shape
    fb = _laplace_feature_block(d)
    Xp = _pad_axis(_pad_axis(Xs, tile_m, 0), fb, 1)
    Yp = _pad_axis(_pad_axis(Ys, tile_n, 0), fb, 1)
    Vp = _pad_axis(_pad_axis(V, tile_n, 0), 8, 1)
    n_p, d_p = Xp.shape
    m_p, k_p = Vp.shape
    ni, nj, nb = n_p // tile_m, m_p // tile_n, d_p // fb
    if nb == 1:
        # Single feature block: the plain (tile_m, d_p) X slab spans the whole
        # feature axis, which Mosaic accepts directly — faster than the 3-D
        # layout below (no leading-unit-dim indexing in the hot loop).
        x_in, x_spec = Xp, pl.BlockSpec((tile_m, d_p), lambda i, j, b: (i, 0))
    else:
        x_in = jnp.transpose(Xp.reshape(n_p, nb, fb), (1, 0, 2))
        x_spec = pl.BlockSpec((1, tile_m, fb), lambda i, j, b: (b, i, 0))

    body = functools.partial(
        _body_laplace, nj=nj, nb=nb, d_orig=d, compensated=compensated,
        acc_mode=_resolve_acc_mode(
            acc_mode,
            ("vpu", V.shape[1]) if k_p <= 16 else "highest",
            V.shape[1],
        ),
    )
    o_spec = pl.BlockSpec((tile_m, k_p), lambda i, j, b: (i, 0))
    out_specs = [o_spec, o_spec] if compensated else o_spec
    out_shape = jax.ShapeDtypeStruct((n_p, k_p), V.dtype)
    if compensated:
        out_shape = [out_shape, out_shape]
    scratch = [
        pltpu.VMEM((tile_m, k_p), jnp.float32),
    ]
    if compensated:
        scratch.append(pltpu.VMEM((tile_m, k_p), jnp.float32))
    scratch.append(pltpu.VMEM((tile_m, tile_n), jnp.float32))

    return pl.pallas_call(
        body,
        grid=(ni, nj, nb),
        in_specs=[
            x_spec,
            pl.BlockSpec((fb, tile_n), lambda i, j, b: (b, j)),
            pl.BlockSpec((k_p, tile_n), lambda i, j, b: (0, j)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_p * m_p * d_p,
            bytes_accessed=(n_p * d_p + m_p * d_p + m_p * k_p + n_p * k_p) * 4,
            transcendentals=n_p * m_p,
        ),
        interpret=interpret,
    )(x_in, Yp.T, Vp.T)


def _pad_axis(x, multiple, axis):
    n = x.shape[axis]
    target = _round_up(n, multiple)
    if target == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return jnp.pad(x, widths)


def _norms_and_operands(kind, Xs, Ys):
    """Precompute the norm vectors and fold constants into the operands.

    RBF: hx = ‖x‖²/2, hy = ‖y‖²/2, cross operand = Xs (so the epilogue is
    ``exp(cross − hx − hy)``). Matérn: hx = ‖x‖², hy = ‖y‖², cross operand
    = 2·Xs (exact power-of-two scale; epilogue ``max(hx + hy − cross, 0)``).
    """
    f32 = jnp.float32
    xn = jnp.sum(Xs.astype(f32) ** 2, axis=1, keepdims=True)  # (n, 1)
    yn = jnp.sum(Ys.astype(f32) ** 2, axis=1, keepdims=True)  # (m, 1)
    if kind == "rbf":
        return Xs, Ys.T, 0.5 * xn, 0.5 * yn.T
    return 2.0 * Xs, Ys.T, xn, yn.T


def _split_bf16(A):
    """A = hi + lo with both parts bf16; exact to ~2⁻¹⁸ relative.

    The barrier is load-bearing: this split runs in XLA (outside the Pallas
    kernel), and the runtime sets ``--xla_allow_excess_precision``, under
    which XLA legally simplifies ``A - f32(bf16(A))`` to zero by keeping the
    bf16 round-trip at full precision — silently collapsing the tier to
    plain bf16 (measured on-chip: 1.2e-2 kernel-value error, identical to
    the 1-pass tier, before the barrier was added).
    """
    hi = lax.optimization_barrier(A.astype(jnp.bfloat16))
    lo = (A - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_3(A):
    """A = hi + mid + lo, all bf16 — captures the full f32 mantissa
    (3 × 8 explicit bits ≥ 24). Same excess-precision barrier rationale as
    :func:`_split_bf16`."""
    f32 = jnp.float32
    hi = lax.optimization_barrier(A.astype(jnp.bfloat16))
    r1 = A - hi.astype(f32)
    mid = lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(f32)).astype(jnp.bfloat16)
    return hi, mid, lo



def _resolve_acc_mode(override, default, k):
    """Apply the user/benchmark acc_mode override to a dispatch default."""
    if override is None:
        return default
    if override == "vpu":
        return ("vpu", k)
    if override not in ("split", "highest", "fast"):
        raise ValueError(f"unknown acc_mode {override!r}")
    return override


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "tile_m", "tile_n", "compute_dtype", "interpret",
        "compensated", "pipeline", "acc_mode",
    ),
)
def kernel_matmat_pallas(
    kind: str,
    X1: jax.Array,
    X2: jax.Array,
    V: jax.Array,
    lengthscale,
    const_scaling=1.0,
    tile_m: Optional[int] = None,
    tile_n: Optional[int] = None,
    compute_dtype: Optional[str] = None,
    interpret: bool = False,
    compensated: bool = False,
    pipeline: bool = True,
    acc_mode: Optional[str] = None,
) -> jax.Array:
    """Fused ``c·k(X1, X2) @ V`` on TPU (see module docstring).

    Args mirror :func:`rlaopt_tpu.ops.kernel_xla.kernel_matmat_xla`; extra
    knobs: tile sizes (default: VMEM-budget autotuned) and the accuracy tier.
    ``acc_mode`` overrides the RHS-contraction engine choice ("vpu" /
    "split" / "highest" / "fast" — see :func:`_acc_update`; None = the
    measured dispatch rule). A tuning/benchmark knob: the default rule is
    derived from the on-chip study in benchmarks/acc_mode_study.py.

    ``compensated=True`` (exact tier only) returns ``(hi, lo)`` with
    ``hi + lo`` the compensated cross-tile sum (TwoSum-carried rounding
    errors) — used by residual evaluation to beat the f32 accumulation
    floor. Consumers must add ``lo`` LAST: ``(b - hi) - lo``.
    """
    if compensated and compute_dtype is not None:
        raise ValueError("compensated accumulation requires the exact tier")
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]
    n, d = X1.shape
    m = X2.shape[0]
    k = V.shape[1]

    Xs = scale_inputs(X1, lengthscale)
    Ys = scale_inputs(X2, lengthscale)

    cd = normalize_compute_dtype(compute_dtype)

    # Path selection: Laplace routes to its dedicated feature-blocked VPU
    # kernel (any d); compensated/tiny-d exact requests take the direct VPU
    # feature loop (exact f32, dodges excess-precision demotion); everything
    # else rides the MXU dot path, with the split-concat fold below choosing
    # the cheapest legal pass structure per tier and d.
    # Split-concat fold: a multi-pass cross term (bf16x3's 3 bf16 passes;
    # the exact tier's HIGHEST = 6-term 3-way-split decomposition) is ONE
    # bf16 dot of concatenated operand splits — bf16x3:
    # [xh|xh|xl]·[yh;yl;yh] (depth 3d); exact: the 6 HIGHEST product terms
    # x1y1+x1y2+x2y1+x1y3+x2y2+x3y1 of the 3-way splits (depth 6d).
    # Whenever round_up(p·d, 128) < p·round_up(d, 128) — small/odd d where
    # each separate pass pays lane padding — the fold cuts real MXU work
    # (e.g. d=28 bf16x3: 3 padded passes → ONE; measured 2.70 → 1.50
    # ms/16k² sweep) and moves the term summation into the MXU accumulator
    # (no (tm, tn) VPU adds). At d ≡ 0 (mod 128) the flop count ties and
    # the fold only adds operand traffic, so it is skipped. Accuracy is
    # unchanged: the same product terms, f32-accumulated, in both forms.
    concat3 = cd == "bf16x3" and _round_up(3 * d, 128) < 3 * _round_up(d, 128)
    # The exact tier folds for d > 6 (measured: one 128-deep fold pass runs
    # 1.5 ms/16k² sweep vs 2.7 ms for the direct VPU loop already at d=8;
    # at tiny d the unrolled loop's ~3d ops/element win). Accuracy parity
    # with the HIGHEST dot path was measured on-chip: 1.91e-6 vs 1.91e-6
    # (k=8) / 7.3e-6 vs 7.6e-6 (k=1) against an f64 oracle at n=1024 —
    # identical decomposition, identical error. The compensated path keeps
    # the true-f32 bodies: it feeds certified residual evaluation, where
    # the 6-term ~2⁻²⁴ truncation is not exact.
    concat6 = (
        cd is None
        and not compensated
        and d > 6
        and _round_up(6 * d, 128) < 6 * _round_up(d, 128)
    )
    direct = cd is None and d <= 32 and not concat6

    k_p8 = _round_up(k, 8)
    if tile_m is None or tile_n is None:
        if concat3 or concat6:
            # single bf16 operand stream of depth p·d
            d_for_budget = _round_up((3 if concat3 else 6) * d, 128)
            tm_auto, tn_auto = select_tiles(
                n, m, d_for_budget, k_p8, kind, "bfloat16"
            )
        else:
            d_for_budget = _round_up(d, 128)
            tm_auto, tn_auto = select_tiles(n, m, d_for_budget, k_p8, kind, cd)
        tile_m = tile_m or tm_auto
        tile_n = tile_n or tn_auto
    if kind == "laplace":
        tile_m, tile_n = min(tile_m, 512), min(tile_n, 1024)
        out = _laplace_matmat(
            Xs, Ys, V, tile_m, tile_n, interpret, compensated, acc_mode
        )
        c = jnp.asarray(const_scaling, V.dtype)
        if compensated:
            hi, lo = out
            hi = hi[:n, :k] * c
            lo = lo[:n, :k] * c
            return (hi[:, 0], lo[:, 0]) if squeeze else (hi, lo)
        out = out[:n, :k] * c
        return out[:, 0] if squeeze else out

    norm_inputs = []
    norm_specs = []
    piped = False
    if direct:
        Xp = _pad_axis(_pad_axis(Xs, tile_m, 0), 128, 1)
        Yp = _pad_axis(_pad_axis(Ys, tile_n, 0), 128, 1)
        inputs = [Xp, Yp.T]
        if compensated:
            body = functools.partial(
                _body_direct_comp, kind=kind, nj=Yp.shape[0] // tile_n,
                d_orig=d,
            )
        else:
            body = functools.partial(
                _body_direct, kind=kind, nj=Yp.shape[0] // tile_n, d_orig=d,
                acc_mode=_resolve_acc_mode(
                    acc_mode, ("vpu", k) if k_p8 <= 16 else "highest", k
                ),
            )
    else:
        Xc, YcT, hx, hyT = _norms_and_operands(kind, Xs, Ys)
        if concat3 or concat6:
            # Pad the POINT axes first (cheap: f32, d features wide) and
            # fold the 128-alignment of the concatenated depth INTO the
            # concatenate as a zero part, so the folded operand is
            # materialized ONCE at its final padded shape. The previous
            # pad-after-concat kept a second full-size copy of the folded
            # Y-side operand alive — at n=10M (config 7) that is 2×4.8 GB
            # of HLO temps and an HBM OOM by itself.
            Xc = _pad_axis(Xc, tile_m, 0)
            YcT = _pad_axis(YcT, tile_n, 1)
            if concat3:
                xh, xl = _split_bf16(Xc)
                yh, yl = _split_bf16(YcT)
                xparts, yparts = [xh, xh, xl], [yh, yl, yh]
            else:
                x1, x2, x3 = _split_bf16_3(Xc)
                y1, y2, y3 = _split_bf16_3(YcT)
                xparts = [x1, x1, x2, x1, x2, x3]
                yparts = [y1, y2, y1, y3, y2, y1]
            depth = sum(p.shape[1] for p in xparts)
            pad_f = _round_up(depth, 128) - depth
            if pad_f:
                bf = xparts[0].dtype
                xparts.append(jnp.zeros((Xc.shape[0], pad_f), bf))
                yparts.append(jnp.zeros((pad_f, YcT.shape[1]), bf))
            Xc = jnp.concatenate(xparts, axis=1)
            YcT = jnp.concatenate(yparts, axis=0)
        else:
            Xc = _pad_axis(_pad_axis(Xc, tile_m, 0), 128, 1)
            YcT = _pad_axis(_pad_axis(YcT, 128, 0), tile_n, 1)
        hx = _pad_axis(hx, tile_m, 0)  # (n_p, 1); zero rows → zero norms
        hyT = _pad_axis(hyT, tile_n, 1)  # (1, m_p)
        norm_inputs = [hx, hyT]
        norm_specs = [
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
        ]
        nj = YcT.shape[1] // tile_n
        if concat3 or concat6:
            inputs = [Xc, YcT]  # concatenated bf16 split arrangement
            # Measured dispatch (benchmarks/ACC_MODE_r3.json): the VPU
            # lane-reduce wins for k <= 8 at every depth and tier; at
            # k in (8, 16] its ~2k ops/value epilogue stops hiding under
            # the MXU window when the concat depth is <= 256 (1-2 cross
            # passes) — there the padded MXU contraction pass is cheaper
            # (bf16x3 d=28 k=16: split 2.07 vs vpu 2.40 ms/sweep; the
            # crossover sits between depth 256 and 384). concat6 keeps
            # the VPU through k=16: its MXU window is 2x concat3's, and
            # "split" is not tier-matched for the exact tier.
            if k_p8 <= 8 or (
                k_p8 <= 16 and (concat6 or Xc.shape[1] > 256)
            ):
                default_acc = ("vpu", k)
            else:
                # tier-matched RHS contraction on the K tile (f32 either way)
                default_acc = "split" if concat3 else "highest"
            acc_mode = _resolve_acc_mode(acc_mode, default_acc, k)
            if pipeline:
                body = functools.partial(
                    _body_pipe, kind=kind, nj=nj, acc_mode=acc_mode,
                    cross_fn=_cross_bf16, n_in=2,
                )
                piped = True
            else:
                body = functools.partial(
                    _body_bf16, kind=kind, nj=nj, acc_mode=acc_mode
                )
        elif cd == "bf16x3":
            xh, xl = _split_bf16(Xc)
            yh, yl = _split_bf16(YcT)
            inputs = [xh, xl, yh, yl]
            acc_mode = _resolve_acc_mode(
                acc_mode, ("vpu", k) if k_p8 <= 16 else "split", k
            )
            if pipeline:
                body = functools.partial(
                    _body_pipe, kind=kind, nj=nj, acc_mode=acc_mode,
                    cross_fn=_cross_split, n_in=4,
                )
                piped = True
            else:
                body = functools.partial(
                    _body_split, kind=kind, nj=nj, acc_mode=acc_mode
                )
        elif cd == "bfloat16":
            inputs = [Xc.astype(jnp.bfloat16), YcT.astype(jnp.bfloat16)]
            # Round-5 measured dispatch: the 1-pass tier has the smallest
            # MXU window, so the k-column VPU lane-reduce contraction is
            # the least hideable — at d>=256 routing it to the MXU as one
            # extra bf16 pass (tier-matched accuracy) wins outright:
            # d=512 k=8: 121.4 -> 128.0 TF (roofline fraction 0.86->0.91);
            # d=256 k=8: 94.5 -> 105.7 TF (0.79->0.89). k=1 and small d
            # keep the VPU reduce (the extra 128-lane pass doubles the
            # MXU work of a 1-pass d=128 cross).
            bf16_fast = k_p8 > 16 or (k > 1 and Xc.shape[1] >= 256)
            acc_mode = _resolve_acc_mode(
                acc_mode, "fast" if bf16_fast else ("vpu", k), k
            )
            if pipeline:
                body = functools.partial(
                    _body_pipe, kind=kind, nj=nj, acc_mode=acc_mode,
                    cross_fn=_cross_bf16, n_in=2,
                )
                piped = True
            else:
                body = functools.partial(
                    _body_bf16, kind=kind, nj=nj, acc_mode=acc_mode
                )
        else:
            inputs = [Xc, YcT]
            if compensated:
                body = functools.partial(_body_exact_comp, kind=kind, nj=nj)
            else:
                acc_mode = _resolve_acc_mode(
                    acc_mode, ("vpu", k) if k_p8 <= 16 else "highest", k
                )
                if pipeline:
                    body = functools.partial(
                        _body_pipe, kind=kind, nj=nj, acc_mode=acc_mode,
                        cross_fn=_cross_exact, n_in=2,
                    )
                    piped = True
                else:
                    body = functools.partial(
                        _body_exact, kind=kind, nj=nj, acc_mode=acc_mode
                    )

    n_p = inputs[0].shape[0]
    d_p = inputs[0].shape[1]
    Vp = _pad_axis(_pad_axis(V, tile_n, 0), 8, 1)
    m_p = Vp.shape[0]
    k_p = Vp.shape[1]
    ni, nj = n_p // tile_m, m_p // tile_n

    x_spec = pl.BlockSpec((tile_m, d_p), lambda i, j: (i, 0))
    y_spec = pl.BlockSpec((d_p, tile_n), lambda i, j: (0, j))
    n_x = len(inputs) // 2
    in_specs = [x_spec] * n_x + [y_spec] * n_x + norm_specs + [
        pl.BlockSpec((k_p, tile_n), lambda i, j: (0, j))
    ]
    inputs = inputs + norm_inputs

    if cd == "bfloat16" or concat3 or concat6:
        flops = 2 * n_p * m_p * (d_p + k_p)
    elif cd == "bf16x3":
        flops = 2 * n_p * m_p * (3 * d_p + k_p)
    else:
        flops = 2 * n_p * m_p * (6 * d_p + k_p)

    o_spec = pl.BlockSpec((tile_m, k_p), lambda i, j: (i, 0))
    if compensated:
        out_specs = [o_spec, o_spec]
        out_shape = [
            jax.ShapeDtypeStruct((n_p, k_p), V.dtype),
            jax.ShapeDtypeStruct((n_p, k_p), V.dtype),
        ]
        scratch = [
            pltpu.VMEM((tile_m, k_p), jnp.float32),
            pltpu.VMEM((tile_m, k_p), jnp.float32),
        ]
    else:
        out_specs = o_spec
        out_shape = jax.ShapeDtypeStruct((n_p, k_p), V.dtype)
        scratch = [pltpu.VMEM((tile_m, k_p), jnp.float32)]
        if piped:
            scratch += [
                pltpu.VMEM((tile_m, tile_n), jnp.float32),  # kprev
                pltpu.VMEM((k_p, tile_n), jnp.float32),  # vprev
            ]

    out = pl.pallas_call(
        body,
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n_p * d_p + m_p * d_p + m_p * k_p + n_p * k_p) * 4,
            transcendentals=n_p * m_p,
        ),
        interpret=interpret,
    )(*inputs, Vp.T)

    c = jnp.asarray(const_scaling, V.dtype)
    if compensated:
        hi, lo = out
        hi = hi[:n, :k] * c
        lo = lo[:n, :k] * c
        return (hi[:, 0], lo[:, 0]) if squeeze else (hi, lo)
    out = out[:n, :k] * c
    return out[:, 0] if squeeze else out


def _fold_tier_operands(Xc, YcT, cd):
    """Concat-fold a tier's bf16 operand splits into single matmul operands.

    The triangle/pair kernels run every tier through ``_cross_bf16`` on
    concatenated splits: exact f32 = 6 parts (full Precision.HIGHEST
    emulation), bf16x3 = 3 parts (lo·lo dropped), bfloat16 = the plain
    cast.

    The 128-alignment of the folded depth is appended HERE as zero concat
    parts so each operand materializes ONCE at its final padded shape.
    Padding after the concat keeps a second full-size copy of the folded
    operand alive as an HLO temp — the general kernel measured that at
    2×4.8 GB (an HBM OOM by itself) at n=10M, and the banded pair driver
    reaches ~9.7M-row bands. Callers pad the POINT axes (cheap: f32, d
    features wide) before calling and must not re-pad the depth axis.
    """
    if cd == "bfloat16":
        xparts = [Xc.astype(jnp.bfloat16)]
        yparts = [YcT.astype(jnp.bfloat16)]
    elif cd == "bf16x3":
        xh, xl = _split_bf16(Xc)
        yh, yl = _split_bf16(YcT)
        xparts, yparts = [xh, xh, xl], [yh, yl, yh]
    else:
        x1, x2, x3 = _split_bf16_3(Xc)
        y1, y2, y3 = _split_bf16_3(YcT)
        xparts = [x1, x1, x2, x1, x2, x3]
        yparts = [y1, y2, y1, y3, y2, y1]
    depth = sum(p.shape[1] for p in xparts)
    pad_f = _round_up(depth, 128) - depth
    if pad_f:
        bf = xparts[0].dtype
        xparts.append(jnp.zeros((Xc.shape[0], pad_f), bf))
        yparts.append(jnp.zeros((pad_f, YcT.shape[1]), bf))
    if len(xparts) == 1:
        return xparts[0], yparts[0]
    return (
        jnp.concatenate(xparts, axis=1),
        jnp.concatenate(yparts, axis=0),
    )


def _sym_epilogue(
    kind, acc_ref, o2_ref, kprev_ref, vjprev_ref, viprev_ref, jrow,
    k_real, k_pad, mirror_mode="vpu",
):
    """Both-triangle contractions of a stored tile.

    ``kv`` serves K@v_j → acc (this row tile) and Kᵀ@v_i → the o2 mirror
    window at row-block ``jrow`` (one (1, T) row per RHS column, laid out
    ``jrow·k_pad + c``). The forward (acc) side is always the per-column
    VPU lane reduce. The mirror side reduces along axis 0 — a SUBLANE
    reduction, ~an order of magnitude slower per element than the lane
    reduce — so per-column VPU mirrors only pay off at k ≤ 2 (measured:
    k=1 symmetric 1.62× the general kernel, k=8 0.72×, BENCH r3
    continuation). ``mirror_mode`` selects the k ≥ 3 alternative: one
    MXU contraction building the whole (k, T) mirror tile per stored
    tile — "split" (3-pass bf16 hi/lo, ~2⁻¹⁸, tier-matched for bf16x3)
    or "fast" (single bf16 pass, for the bfloat16 tier) — plus a single
    dynamic window update instead of k.
    """
    kv = _finish_pre(kind, kprev_ref[:])
    for c in range(k_real):
        acc_ref[:, c : c + 1] += jnp.sum(
            kv * vjprev_ref[c : c + 1, :], axis=1, keepdims=True
        )
    if mirror_mode == "vpu":
        # viprev layout: (T, k_pad)
        for c in range(k_real):
            o2_ref[pl.ds(jrow * k_pad + c, 1), :] += jnp.sum(
                kv * viprev_ref[:, c : c + 1], axis=0, keepdims=True
            )
        return
    f32 = jnp.float32
    vit = viprev_ref[:]  # transposed layout (k_pad, T): standard matmul
    if mirror_mode == "highest":
        # exact tier: 6-pass 3-way-split contraction (f32-grade, the
        # same decomposition as the tier's own concat6/HIGHEST cross)
        mirror = _mirror_dot6(kv, vit)
    elif mirror_mode == "split":
        kh = kv.astype(jnp.bfloat16)
        kl = (kv - kh.astype(f32)).astype(jnp.bfloat16)
        vh = vit.astype(jnp.bfloat16)
        vl = (vit - vh.astype(f32)).astype(jnp.bfloat16)
        mirror = (
            lax.dot_general(vh, kh, _DN, preferred_element_type=f32)
            + lax.dot_general(vh, kl, _DN, preferred_element_type=f32)
            + lax.dot_general(vl, kh, _DN, preferred_element_type=f32)
        )
    else:  # "fast"
        mirror = lax.dot_general(
            vit.astype(jnp.bfloat16), kv.astype(jnp.bfloat16), _DN,
            preferred_element_type=f32,
        )
    o2_ref[pl.ds(jrow * k_pad, k_pad), :] += mirror


def _body_sym(
    x_ref, y_ref, hx_ref, hy_ref, vj_ref, vi_ref, o1_ref, o2_ref,
    acc_ref, kprev_ref, vjprev_ref, viprev_ref,
    *, kind, nt, ns, nt_even, cross_fn, k_real, k_pad, mirror_mode,
):
    """Symmetric-matmat body: each visited tile serves BOTH triangles.

    Grid (i, s) maps to tile (i, j) with j = (i + s) mod nt (circulant
    pairing): for odd nt, s ∈ [0, (nt-1)/2] visits every unordered block
    pair exactly once; for even nt the extra s = nt/2 column is
    double-covered, so it is active only for i < nt/2. Each active
    off-diagonal tile contributes K@V_j to out1[i] (scratch accumulator,
    flushed per row) AND KᵀV_i to out2[j] (accumulated in the
    whole-array output window, which has a constant index map and so
    stays resident in VMEM for the entire grid; k_real ≤ 8 RHS columns
    each own a (1, T) row of the window). Diagonal tiles (s = 0)
    are full tiles and must not mirror; inactive steps contribute
    nothing. Both exclusions are implemented by zeroing the STORED
    pipeline copies of V_i / V_j, so the software-pipelined epilogue
    (previous tile's exp + contractions under the current tile's MXU
    cross passes, as in ``_body_pipe``) needs no flag bookkeeping.
    """
    i = pl.program_id(0)
    s = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _():
        o2_ref[:] = jnp.zeros_like(o2_ref)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        kprev_ref[:] = jnp.zeros_like(kprev_ref)
        vjprev_ref[:] = jnp.zeros_like(vjprev_ref)
        viprev_ref[:] = jnp.zeros_like(viprev_ref)

    cross = cross_fn((x_ref, y_ref))

    # epilogue of the PREVIOUS tile (s-1) in this row — overlaps the MXU
    jprev = lax.rem(i + jnp.maximum(s - 1, 0), jnp.int32(nt))
    _sym_epilogue(
        kind, acc_ref, o2_ref, kprev_ref, vjprev_ref, viprev_ref, jprev,
        k_real, k_pad, mirror_mode,
    )

    if nt_even:
        active = jnp.logical_or(s < ns - 1, i < nt // 2).astype(f32)
    else:
        active = jnp.float32(1.0)
    mirror_ok = active * (s > 0).astype(f32)
    kprev_ref[:] = _pre_tile(kind, cross, hx_ref[:], hy_ref[:])
    vjprev_ref[:] = vj_ref[:].astype(f32) * active
    viprev_ref[:] = vi_ref[:].astype(f32) * mirror_ok

    @pl.when(s == ns - 1)
    def _():
        jlast = lax.rem(i + s, jnp.int32(nt))
        _sym_epilogue(
            kind, acc_ref, o2_ref, kprev_ref, vjprev_ref, viprev_ref,
            jlast, k_real, k_pad, mirror_mode,
        )
        o1_ref[:] = acc_ref[:].astype(o1_ref.dtype)


# Laplace flat window budget (feature-blocked body, different scratch
# mix; its pallas_call already runs at the raised 64 MiB scoped limit).
_SYM_OUT2_BUDGET_BYTES = 40 * 1024 * 1024

# Mirror-window rows per tile in the Laplace MXU mirror mode (the (8, T)
# tile one _mirror_dot6 contraction builds; 8 = f32 sublane count, so the
# dynamic window writes stay sublane-aligned).
_LAPLACE_KPAD = 8


def _laplace_sym_mirror_mode(n: int, k: int):
    """Mirror engine for the Laplace symmetric bodies at size (n, k).

    "mxu" (preferred): one 6-pass bf16-split contraction per tile on the
    otherwise-idle MXU — full f32-grade, k ≤ 16 — needs a
    round_up(k, 8)-row-per-tile window (4·k_pad·n_p bytes). "vpu":
    per-column sublane reduces, k-row window (largest single-window n,
    ~10.5M rows at k=1) but ~4.3 µs per tile and only worthwhile at
    k ≤ 2. None: no single-window fit (the banded driver takes over)."""
    n_p = _round_up(n, 512)
    if k <= 16 and 4 * n_p * _round_up(k, 8) <= _SYM_OUT2_BUDGET_BYTES:
        return "mxu"
    if 4 * n_p * k <= _SYM_OUT2_BUDGET_BYTES:
        return "vpu"
    return None

# The symmetric kernels raise Mosaic's scoped-VMEM limit from the 16 MiB
# default: v5e VMEM is 128 MB, and the Laplace symmetric kernel has run
# at a 64 MiB scoped allocation on the real chip since round 3.
_SYM_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _sym_mirror_mode(cd, k: int) -> str:
    """Mirror-contraction engine for the triangle/pair epilogue.

    Per-column VPU mirrors (sublane reduces) through k=2; beyond that a
    tier-matched MXU contraction builds the whole mirror tile: "fast"
    (one bf16 pass) for the bfloat16 tier, "split" (3-pass bf16 hi/lo,
    ~2⁻¹⁸) for bf16x3, and "highest" (6-pass 3-way split,
    :func:`_mirror_dot6` — the same 6-term decomposition the exact
    tier's concat6 fold / Precision.HIGHEST dot uses, so f32-grade) for
    the exact tier. Round 3 capped the exact tier at the VPU mirror
    (k ≤ 2, measured 0.83× the general kernel at k=8); the 6-pass MXU
    mirror lifts that — all dot-path tiers now mirror through k=16."""
    if k <= 2:
        return "vpu"
    if cd is None:
        return "highest"
    return "fast" if cd == "bfloat16" else "split"


def _sym_window_budget_bytes(depth: int, tile: int = 512) -> int:
    """VMEM available for the resident mirror window at a concat depth.

    The dot-path symmetric body's other VMEM residents are the streamed
    bf16 operand blocks (x and y, double-buffered: 2·2·tile·depth·2 B),
    the kprev f32 scratch tile (4·tile²), and ~2 live f32 (T, T)
    intermediates during the cross/exp epilogue (8·tile²). Subtracting
    those from a 40 MiB base (the pallas_call requests a 64 MiB scoped
    limit — see ``_SYM_VMEM_LIMIT_BYTES`` — leaving 24 MiB of headroom
    for Mosaic's own temporaries) gives the window room: ~36 MiB at
    depth 128 (the d=28 flagship — k=1 single-window to n ≈ 9M, k=8 at
    n=1M), ~34 MiB at the depth-512 cap. NOTE: on runtimes with an
    execution watchdog (~80-90 s on the tunneled v5e) a single triangle
    sweep is itself time-bounded near n ≈ 7M; the predicate gates VMEM
    fit only."""
    streams = 2 * 2 * tile * depth * 2
    tiles_f32 = 12 * tile * tile
    return 40 * 1024 * 1024 - streams - tiles_f32


def _sym_tier_params(d: int, k: int, cd) -> tuple:
    """(MXU passes, folded concat depth, padded mirror k) for a tier.

    The single source for these three derived quantities — the support
    predicates, the banded driver's band sizing, and the kernels must
    agree on them or dispatch eligibility silently desynchronizes from
    the actual VMEM footprint."""
    passes = {None: 6, "bf16x3": 3, "bfloat16": 1}[cd]
    depth = _round_up(passes * d, 128)
    k_pad = k if _sym_mirror_mode(cd, k) == "vpu" else _round_up(k, 8)
    return passes, depth, k_pad


def _sym_tier_gate(d: int, k: int, kind: str, compute_dtype, compensated):
    """Shared eligibility gates of the symmetric dot-path kernels.

    Returns ``(cd, depth, k_pad)`` when the triangle/pair machinery
    applies, else None: dot-path kind only, plain accumulation, k ≤ 16
    (each RHS column owns a mirror-window row; past 16 the per-value
    VPU forward contraction stops hiding under the halved MXU window
    and the general kernel's MXU contraction dispatch wins), concat
    depth ≤ 512 (fixed T=512 tiles must fit VMEM beside the mirror
    window). Since round 4 the exact tier mirrors through the 6-pass
    MXU contraction (mirror mode "highest") at k ≥ 3, so it carries
    the same k ≤ 16 cap as the bf16 tiers — the round-3 k ≤ 2 cap was
    the per-column sublane-reduce mirror losing past k=2 (measured
    k=8: 0.83× the general kernel)."""
    if compensated or k > 16 or kind == "laplace":
        return None
    try:
        cd = normalize_compute_dtype(compute_dtype)
    except ValueError:
        return None
    _, depth, k_pad = _sym_tier_params(d, k, cd)
    if depth > 512:
        return None
    return cd, depth, k_pad


def kernel_symmetric_supported(
    n: int, d: int, k: int, kind: str, compute_dtype,
    compensated: bool = False,
) -> bool:
    """Whether the triangle kernel applies: square symmetric Gram (X1 is
    X2 — caller's responsibility), ≤ 16 RHS columns on the dot-path
    tiers (each owns a row of the resident mirror window; k ≥ 3 goes
    through a tier-matched MXU mirror contraction — 6-pass "highest" on
    the exact tier since round 4), plain accumulation, dot-path concat
    depth ≤ 512 (so the fixed T=512 tiles fit VMEM alongside the
    resident mirror window), and the mirror window itself fits the
    depth-aware budget (:func:`_sym_window_budget_bytes`). Laplace: the
    MXU mirror window covers k ≤ 16 (n ≲ 1.3M at k ≤ 8, ~650k at
    k ≤ 16); beyond that window the VPU sublane-reduce mirror extends
    single-window reach to ~10.5M rows at k ≤ 2."""
    if kind == "laplace":
        # Feature-blocked VPU kernel: any d, exp-tier-independent. The
        # MXU mirror mode (6-pass split contraction on the body's idle
        # MXU — full f32-grade) takes k ≤ 16 within its
        # round_up(k, 8)-row window (n ≲ 1.3M at k ≤ 8, ~650k at
        # k ≤ 16); past that the VPU sublane-reduce mirror extends
        # the single window to ~10.5M rows at k ≤ 2.
        if compensated or k > 16:
            return False
        mode = _laplace_sym_mirror_mode(n, k)
        if mode is None or (mode == "vpu" and k > 2):
            return False
        return True
    gate = _sym_tier_gate(d, k, kind, compute_dtype, compensated)
    if gate is None:
        return False
    _cd, depth, k_pad = gate
    return 4 * _round_up(n, 512) * k_pad <= _sym_window_budget_bytes(depth)


@functools.partial(
    jax.jit, static_argnames=("kind", "compute_dtype", "tile", "interpret")
)
def kernel_matvec_symmetric(
    kind: str,
    X: jax.Array,
    v: jax.Array,
    lengthscale,
    const_scaling=1.0,
    compute_dtype: Optional[str] = None,
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``c·k(X, X) @ V`` visiting only ~half the Gram tiles (symmetry).

    The Gram matrix of a kernel on one data set is symmetric, so every
    superdiagonal tile K_ij can serve both K_ij@V_j → out[i] and
    K_ijᵀV_i → out[j] while materialized once in VMEM — halving the n²
    transcendental + MXU cross work that dominates the matvec (the
    reference's KeOps engine has no symmetric mode; this is TPU-side
    gravy on SURVEY N10). V may have up to 16 columns (each owns a (1, T)
    row of the resident mirror window; the per-column VPU contractions
    total the same op count as the general kernel's — only the exp and
    cross work halve). Restrictions in
    :func:`kernel_symmetric_supported`; measured on-chip at n=2¹⁷, d=28,
    k=1: 0.434 vs 0.641 ms per 16k²-equivalent sweep (bf16x3, 1.48×) and
    0.589 vs 1.012 (exact tier, 1.72×), agreeing with the general kernel
    to 3e-7. Accuracy: for k ≤ 2 the tier is exactly the general
    kernel's — same tile formulas, same f32 VPU contractions. For k ≥ 3
    the MIRROR rows (the upper triangle served by transposed tiles) go
    through a tier-matched MXU contraction instead: "highest" (6-pass
    3-way split, :func:`_mirror_dot6` — the same decomposition as the
    tier's own concat6/HIGHEST cross, f32-grade) on the exact tier,
    "split" (3-pass bf16 hi/lo, ~2⁻¹⁸ per product — tier-matched for
    bf16x3, measured ≤8e-6 vs the general kernel) on bf16x3, and a
    plain bf16 pass on the bfloat16 tier (re-rounds the f32 kernel tile
    to bf16: ~2⁻⁸-grade extra error on those rows, measured ~2e-3 —
    within that tier's own ~1e-2 value error, but NOT bit-identical to
    the general kernel).
    """
    squeeze = v.ndim == 1
    V = v[:, None] if squeeze else v
    n, d = X.shape
    k = V.shape[1]

    Xs = scale_inputs(X, lengthscale)
    if kind == "laplace":
        out = _laplace_matvec_symmetric(Xs, V, tile, interpret)
        out = (
            out[:n, :k] * jnp.asarray(const_scaling, jnp.float32)
        ).astype(v.dtype)
        return out[:, 0] if squeeze else out
    cd = normalize_compute_dtype(compute_dtype)

    T = tile
    Xc, YcT, hx, hyT = _norms_and_operands(kind, Xs, Xs)
    # Point axes padded BEFORE the fold; the fold appends the depth
    # 128-alignment itself (single materialization — see the helper).
    Xc = _pad_axis(Xc, T, 0)
    YcT = _pad_axis(YcT, T, 1)
    Xc, YcT = _fold_tier_operands(Xc, YcT, cd)
    hx = _pad_axis(hx, T, 0)
    hyT = _pad_axis(hyT, T, 1)
    # VPU mirror mode (k <= 2 or exact tier): no 8-padding of k —
    # full-trailing-axis blocks of width k are legal (the k=1 original
    # used (T, 1) blocks), and the resident mirror window scales with k;
    # padding would shrink the supported n by 8x for the k=1 flagship
    # matvec. MXU mirror mode (k >= 3, any dot tier): k pads to the next
    # sublane multiple (8 / 16) so the V_i blocks arrive TRANSPOSED
    # (k_pad, T) for a standard-shape mirror matmul and the window's
    # dynamic row writes stay sublane-aligned.
    mirror_mode = _sym_mirror_mode(cd, k)
    k_pad = k if mirror_mode == "vpu" else _round_up(k, 8)
    Vp = _pad_axis(
        _pad_axis(V.astype(jnp.float32), T, 0), k_pad, 1
    )

    n_p, d_p = Xc.shape
    nt = n_p // T
    nt_even = nt % 2 == 0
    ns = nt // 2 + 1 if nt_even else (nt + 1) // 2
    if mirror_mode == "vpu":
        vi_spec = pl.BlockSpec((T, k_pad), lambda i, s: (i, 0))
        vi_in = Vp
        vi_scratch = pltpu.VMEM((T, k_pad), jnp.float32)
    else:
        vi_spec = pl.BlockSpec((k_pad, T), lambda i, s: (0, i))
        vi_in = Vp.T
        vi_scratch = pltpu.VMEM((k_pad, T), jnp.float32)

    out1, out2 = pl.pallas_call(
        functools.partial(
            _body_sym, kind=kind, nt=nt, ns=ns, nt_even=nt_even,
            cross_fn=_cross_bf16, k_real=k, k_pad=k_pad,
            mirror_mode=mirror_mode,
        ),
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((T, d_p), lambda i, s: (i, 0)),
            pl.BlockSpec((d_p, T), lambda i, s: (0, (i + s) % nt)),
            pl.BlockSpec((T, 1), lambda i, s: (i, 0)),
            pl.BlockSpec((1, T), lambda i, s: (0, (i + s) % nt)),
            pl.BlockSpec((k_pad, T), lambda i, s: (0, (i + s) % nt)),  # V_j^T
            vi_spec,  # V_i ((T, k) vpu-mirror layout / (8, T) transposed)
        ],
        out_specs=[
            pl.BlockSpec((T, k_pad), lambda i, s: (i, 0)),
            pl.BlockSpec((nt * k_pad, T), lambda i, s: (0, 0)),  # mirror
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((nt * k_pad, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, k_pad), jnp.float32),  # acc (direct)
            pltpu.VMEM((T, T), jnp.float32),  # kprev
            pltpu.VMEM((k_pad, T), jnp.float32),  # vjprev
            vi_scratch,  # viprev (layout matches vi_spec)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_SYM_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_p * n_p * (d_p + 2 * k_pad),
            bytes_accessed=(2 * n_p * d_p + 6 * n_p * k_pad) * 4,
            transcendentals=n_p * n_p // 2,
        ),
        interpret=interpret,
    )(Xc, YcT, hx, hyT, Vp.T, vi_in)

    # mirror window row j·k_pad + c holds column c's contribution to the
    # T output rows of tile j
    mirror = out2.reshape(nt, k_pad, T).transpose(0, 2, 1).reshape(
        n_p, k_pad
    )
    out = (out1 + mirror)[:n, :k] * jnp.asarray(
        const_scaling, jnp.float32
    )
    out = out.astype(v.dtype)
    return out[:, 0] if squeeze else out


def _body_pair(
    x_ref, y_ref, hx_ref, hy_ref, vj_ref, vi_ref, o1_ref, o2_ref,
    acc_ref, kprev_ref, vjprev_ref, viprev_ref,
    *, kind, nj, cross_fn, k_real, k_pad, mirror_mode,
):
    """Two-output rectangular body: one K_IJ materialization, both products.

    ``_body_sym`` without the circulant pairing: the grid is the full
    (nt_i, nt_j) rectangle of an OFF-DIAGONAL band pair, every tile is
    active and mirrored (no diagonal, no double-cover), so the masks
    reduce away. Each tile contributes K@V_j to out1[i] (row scratch
    accumulator) and KᵀV_i to the out2 mirror window (resident — sized
    by the J band, not the whole operator, which is what lets the banded
    driver scale past the VMEM window limit). Same software-pipelined
    epilogue: tile j−1's exp + contractions run under tile j's MXU cross
    passes; j = 0 zeroes the stored copies so warm-up is branch-free.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        o2_ref[:] = jnp.zeros_like(o2_ref)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        kprev_ref[:] = jnp.zeros_like(kprev_ref)
        vjprev_ref[:] = jnp.zeros_like(vjprev_ref)
        viprev_ref[:] = jnp.zeros_like(viprev_ref)

    cross = cross_fn((x_ref, y_ref))

    # epilogue of the PREVIOUS tile (j-1) in this row — overlaps the MXU
    jprev = jnp.maximum(j - 1, 0)
    _sym_epilogue(
        kind, acc_ref, o2_ref, kprev_ref, vjprev_ref, viprev_ref, jprev,
        k_real, k_pad, mirror_mode,
    )

    kprev_ref[:] = _pre_tile(kind, cross, hx_ref[:], hy_ref[:])
    vjprev_ref[:] = vj_ref[:].astype(f32)
    viprev_ref[:] = vi_ref[:].astype(f32)

    @pl.when(j == nj - 1)
    def _():
        _sym_epilogue(
            kind, acc_ref, o2_ref, kprev_ref, vjprev_ref, viprev_ref,
            jnp.int32(nj - 1), k_real, k_pad, mirror_mode,
        )
        o1_ref[:] = acc_ref[:].astype(o1_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kind", "compute_dtype", "tile", "interpret")
)
def kernel_pair_matmat(
    kind: str,
    X1: jax.Array,
    X2: jax.Array,
    V2: jax.Array,
    V1: jax.Array,
    lengthscale,
    const_scaling=1.0,
    compute_dtype: Optional[str] = None,
    tile: int = 512,
    interpret: bool = False,
) -> tuple:
    """``(c·K @ V2, c·Kᵀ @ V1)`` with ``K = k(X1, X2)`` materialized ONCE.

    The building block of the banded symmetric driver: for an
    off-diagonal band pair of one data set, K_IJ and K_JIᵀ are the same
    matrix, so serving both directions from one tile materialization
    halves the n² exp + MXU cross work exactly as the triangle kernel
    does — but with the resident mirror window sized to the J band
    (4·n2·k bytes) instead of the whole operator. Returns f32 outputs
    of shape (n1, k) and (n2, k) — always 2-D, even for 1-D inputs
    (the :func:`rlaopt_tpu.ops.kernel_dispatch.kernel_pair` wrapper
    restores 1-D). Accuracy matches the triangle kernel's contract (see
    :func:`kernel_matvec_symmetric`): tier-exact for k ≤ 2; the k ≥ 3
    MIRROR output (o2) goes through the tier-matched MXU contraction —
    "highest" (6-pass, f32-grade) on the exact tier, "split" ~2⁻¹⁸ on
    bf16x3, a plain bf16 re-round (~2⁻⁸
    on those rows) on the bfloat16 tier. Laplace routes to the
    feature-blocked VPU pair body (:func:`_laplace_pair_matmat`,
    exact-f32 values, ``compute_dtype`` ignored as in the general
    Laplace engine).
    """
    if V2.ndim == 1:
        V2 = V2[:, None]
    if V1.ndim == 1:
        V1 = V1[:, None]
    n1, d = X1.shape
    n2 = X2.shape[0]
    k = V2.shape[1]
    T = tile
    c = jnp.asarray(const_scaling, jnp.float32)
    if kind == "laplace":
        o1, o2 = _laplace_pair_matmat(
            scale_inputs(X1, lengthscale), scale_inputs(X2, lengthscale),
            V2, V1, T, interpret,
        )
        return o1[:n1, :k] * c, o2[:n2, :k] * c
    cd = normalize_compute_dtype(compute_dtype)

    Xc, YcT, hx, hyT = _norms_and_operands(
        kind, scale_inputs(X1, lengthscale), scale_inputs(X2, lengthscale)
    )
    # Point axes padded BEFORE the fold (f32, d wide — cheap); the fold
    # appends the depth 128-alignment itself so the operands materialize
    # once at final shape (HBM-OOM hazard otherwise, see the helper).
    Xc = _pad_axis(Xc, T, 0)
    YcT = _pad_axis(YcT, T, 1)
    Xc, YcT = _fold_tier_operands(Xc, YcT, cd)
    hx = _pad_axis(hx, T, 0)
    hyT = _pad_axis(hyT, T, 1)
    # layouts: see kernel_matvec_symmetric (vpu mirror keeps k unpadded;
    # the MXU mirror pads k to the next sublane multiple and transposes
    # the V1 blocks)
    mirror_mode = _sym_mirror_mode(cd, k)
    k_pad = k if mirror_mode == "vpu" else _round_up(k, 8)
    V1p = _pad_axis(_pad_axis(V1.astype(jnp.float32), T, 0), k_pad, 1)
    V2p = _pad_axis(_pad_axis(V2.astype(jnp.float32), T, 0), k_pad, 1)

    n1_p, d_p = Xc.shape
    n2_p = YcT.shape[1]
    nt1, nt2 = n1_p // T, n2_p // T
    if mirror_mode == "vpu":
        vi_spec = pl.BlockSpec((T, k_pad), lambda i, j: (i, 0))
        vi_in = V1p
        vi_scratch = pltpu.VMEM((T, k_pad), jnp.float32)
    else:
        vi_spec = pl.BlockSpec((k_pad, T), lambda i, j: (0, i))
        vi_in = V1p.T
        vi_scratch = pltpu.VMEM((k_pad, T), jnp.float32)

    out1, out2 = pl.pallas_call(
        functools.partial(
            _body_pair, kind=kind, nj=nt2, cross_fn=_cross_bf16,
            k_real=k, k_pad=k_pad, mirror_mode=mirror_mode,
        ),
        grid=(nt1, nt2),
        in_specs=[
            pl.BlockSpec((T, d_p), lambda i, j: (i, 0)),
            pl.BlockSpec((d_p, T), lambda i, j: (0, j)),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, T), lambda i, j: (0, j)),
            pl.BlockSpec((k_pad, T), lambda i, j: (0, j)),  # V2^T
            vi_spec,  # V1 ((T, k) vpu-mirror layout / (8, T) transposed)
        ],
        out_specs=[
            pl.BlockSpec((T, k_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((nt2 * k_pad, T), lambda i, j: (0, 0)),  # mirror
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1_p, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((nt2 * k_pad, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, k_pad), jnp.float32),  # acc
            pltpu.VMEM((T, T), jnp.float32),  # kprev
            pltpu.VMEM((k_pad, T), jnp.float32),  # vjprev
            vi_scratch,  # viprev (layout matches vi_spec)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_SYM_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n1_p * n2_p * (d_p + 4 * k_pad),
            bytes_accessed=(n1_p * d_p + n2_p * d_p
                            + 4 * (n1_p + n2_p) * k_pad) * 4,
            transcendentals=n1_p * n2_p,
        ),
        interpret=interpret,
    )(Xc, YcT, hx, hyT, V2p.T, vi_in)

    mirror = out2.reshape(nt2, k_pad, T).transpose(0, 2, 1).reshape(
        n2_p, k_pad
    )
    return out1[:n1, :k] * c, mirror[:n2, :k] * c


def _sym_band_rows(depth: int, k: int, tile: int = 512) -> int:
    """Largest tile-multiple band height whose mirror window fits VMEM."""
    return max(
        tile, _sym_window_budget_bytes(depth, tile) // (4 * k) // tile * tile
    )


def _laplace_sym_band_rows(k: int, tile: int = 512) -> int:
    """Laplace band height: the flat OUT2 budget divided by the
    round_up(k, 8)-row MXU mirror window (bands are sized so every
    within-band kernel runs the fast MXU mirror mode; the
    feature-blocked body has no folded-depth operand streams to charge —
    its scratch mix is the (T, T) L1 tile plus the (T, k) accumulator,
    both inside the 64 MiB scoped headroom)."""
    return max(
        tile,
        _SYM_OUT2_BUDGET_BYTES // (4 * _round_up(k, 8)) // tile * tile,
    )


# Band count cap: pairs grow as nb²/2 separate pallas calls in one trace
# (compile time + HBM re-reads of the band operands). 16 bands covers
# n ≈ 35M at k=1 before the banded path stops claiming eligibility.
_SYM_MAX_BANDS = 16


def kernel_symmetric_banded_supported(
    n: int, d: int, k: int, kind: str, compute_dtype,
    compensated: bool = False,
) -> bool:
    """Whether the banded symmetric driver applies: same kind/k/depth
    gates as the single-window triangle kernel, with the window
    constraint relaxed to PER-BAND (any n up to the band-count cap).
    The single-window predicate implies this one."""
    if kind == "laplace":
        if compensated or k > 16:
            return False
        band = _laplace_sym_band_rows(k)
        return -(-n // band) <= _SYM_MAX_BANDS
    gate = _sym_tier_gate(d, k, kind, compute_dtype, compensated)
    if gate is None:
        return False
    _cd, depth, k_pad = gate
    band = _sym_band_rows(depth, k_pad)
    return -(-n // band) <= _SYM_MAX_BANDS


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "compute_dtype", "tile", "interpret", "band_rows"
    ),
)
def kernel_matmat_symmetric_banded(
    kind: str,
    X: jax.Array,
    v: jax.Array,
    lengthscale,
    const_scaling=1.0,
    compute_dtype: Optional[str] = None,
    tile: int = 512,
    interpret: bool = False,
    band_rows: Optional[int] = None,
) -> jax.Array:
    """``c·k(X, X) @ V`` at half work for operators PAST the VMEM window.

    The single-call triangle kernel (:func:`kernel_matvec_symmetric`)
    keeps its whole mirror accumulator resident in VMEM, capping n·k.
    This driver partitions the rows into bands sized to that window,
    then covers the Gram block structure exactly once: diagonal bands
    through the triangle kernel, each off-diagonal band pair through
    :func:`kernel_pair_matmat` (one K_IJ materialization serving both
    K_IJ@V_J and K_IJᵀ@V_I). Total transcendental + MXU cross work is
    ~half the general kernel's at ANY n; the extra cost vs the
    single-window path is re-reading band operands O(nb·n·d) — negligible
    against the O(n²) tile work. Accuracy: identical tier formulas; the
    banded accumulation order differs from the general kernel's by f32
    rounding only.
    """
    squeeze = v.ndim == 1
    V = v[:, None] if squeeze else v
    n = X.shape[0]
    k = V.shape[1]
    if kind == "laplace":
        band = band_rows or _laplace_sym_band_rows(k, tile)
    else:
        cd = normalize_compute_dtype(compute_dtype)
        _passes, depth, k_pad = _sym_tier_params(X.shape[1], k, cd)
        band = band_rows or _sym_band_rows(depth, k_pad, tile)
    nb = -(-n // band)

    if nb == 1:
        out = kernel_matvec_symmetric(
            kind, X, V, lengthscale, const_scaling,
            compute_dtype=compute_dtype, tile=tile, interpret=interpret,
        )
        return out[:, 0] if squeeze else out

    bounds = [(a * band, min((a + 1) * band, n)) for a in range(nb)]
    outs = [jnp.zeros((hi - lo, k), jnp.float32) for lo, hi in bounds]
    for a, (lo_a, hi_a) in enumerate(bounds):
        Xa = X[lo_a:hi_a]
        outs[a] = outs[a] + kernel_matvec_symmetric(
            kind, Xa, V[lo_a:hi_a], lengthscale, const_scaling,
            compute_dtype=compute_dtype, tile=tile, interpret=interpret,
        ).astype(jnp.float32)
        for b in range(a + 1, nb):
            lo_b, hi_b = bounds[b]
            o_a, o_b = kernel_pair_matmat(
                kind, Xa, X[lo_b:hi_b], V[lo_b:hi_b], V[lo_a:hi_a],
                lengthscale, const_scaling, compute_dtype=compute_dtype,
                tile=tile, interpret=interpret,
            )
            outs[a] = outs[a] + o_a
            outs[b] = outs[b] + o_b
    out = jnp.concatenate(outs, axis=0).astype(v.dtype)
    return out[:, 0] if squeeze else out


def _mirror_dot6(kv, vit):
    """``vit @ kv`` ((k_pad, T)·(T, T)) as a 6-pass bf16-split MXU
    contraction — the ``Precision.HIGHEST`` emulation (hi/mid/lo
    operand splits, products down to lo·hi), i.e. full f32-grade. Used
    by the Laplace symmetric bodies: their tile work is pure VPU
    (feature loop + exp), so the mirror contraction rides the otherwise
    IDLE MXU instead of a sublane reduce (measured: the per-column
    sublane-reduce mirror was 36 ms of the 106.5 ms triangle matvec at
    n=65536, d=50 — 4.3 µs/tile, half the body cost).

    Unlike :func:`_split_bf16`/:func:`_split_bf16_3` (which run in XLA
    and NEED ``lax.optimization_barrier`` against the
    ``--xla_allow_excess_precision`` folding of ``A - f32(bf16(A))`` to
    zero), this split runs INSIDE the Pallas body and cannot carry the
    barrier — Mosaic has no lowering for the primitive (verified
    on-chip 2026-08-20: ``NotImplementedError: Unimplemented primitive
    in Pallas TPU lowering ... optimization_barrier``). Mosaic also
    does not apply that XLA simplification: the on-chip mirror parity
    capture (benchmarks/MIRROR_PARITY_r4.json, 2026-08-20 — Laplace
    symmetric k=4 at 1.37e-7 and exact-tier rbf k=10 at 1.52e-7 vs the
    general kernel; 1.63e-6 vs an f64 oracle, matching the exact
    tier's own error, against ~2e-3 if the split collapsed to plain
    bf16) proves the 6-pass contraction survives lowering."""
    f32 = jnp.float32
    bf = jnp.bfloat16
    kh = kv.astype(bf)
    km = (kv - kh.astype(f32)).astype(bf)
    kl = (kv - kh.astype(f32) - km.astype(f32)).astype(bf)
    vh = vit.astype(bf)
    vm = (vit - vh.astype(f32)).astype(bf)
    vl = (vit - vh.astype(f32) - vm.astype(f32)).astype(bf)
    return (
        lax.dot_general(vh, kh, _DN, preferred_element_type=f32)
        + lax.dot_general(vh, km, _DN, preferred_element_type=f32)
        + lax.dot_general(vm, kh, _DN, preferred_element_type=f32)
        + lax.dot_general(vh, kl, _DN, preferred_element_type=f32)
        + lax.dot_general(vm, km, _DN, preferred_element_type=f32)
        + lax.dot_general(vl, kh, _DN, preferred_element_type=f32)
    )


def _laplace_sym_epilogue(
    kv, acc_ref, o2_ref, vj, vi, jrow, k_real, mirror_mode="mxu",
    k_pad=_LAPLACE_KPAD,
):
    """Both-triangle contractions of a finished Laplace tile.

    Forward: per-column VPU lane reduces into the row accumulator.
    Mirror ("mxu", default): one 6-pass bf16-split MXU contraction
    (:func:`_mirror_dot6` — full f32-grade, and the Laplace body's MXU
    is otherwise idle) builds the whole (8, T) mirror tile; ``vi``
    arrives TRANSPOSED (8, T) and the window owns 8 rows per tile.
    Mirror ("vpu"): per-column SUBLANE reduces into window row
    ``jrow·k + c`` with ``vi`` in (T, k) layout — keeps the window k×
    smaller (largest single-window n), at ~4.3 µs/tile.
    """
    for c in range(k_real):
        acc_ref[:, c : c + 1] += jnp.sum(
            kv * vj[c : c + 1, :], axis=1, keepdims=True
        )
    if mirror_mode == "mxu":
        o2_ref[pl.ds(jrow * k_pad, k_pad), :] += _mirror_dot6(kv, vi)
        return
    for c in range(k_real):
        o2_ref[pl.ds(jrow * k_real + c, 1), :] += jnp.sum(
            kv * vi[:, c : c + 1], axis=0, keepdims=True
        )


def _body_sym_laplace(
    x_ref, y_ref, vj_ref, vi_ref, o1_ref, o2_ref, acc_ref, l1_ref,
    *, nt, ns, nt_even, nb, k_real, mirror_mode, k_pad=_LAPLACE_KPAD,
):
    """Symmetric Laplace body: circulant pairing (as ``_body_sym``) with
    the L1 feature-block axis as a third grid dimension. The VPU feature
    loop dominates, so no software pipelining is needed; the active /
    mirror gates are applied directly at the per-tile epilogue."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    b = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(jnp.logical_and(jnp.logical_and(i == 0, s == 0), b == 0))
    def _():
        o2_ref[:] = jnp.zeros_like(o2_ref)

    @pl.when(jnp.logical_and(s == 0, b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(b == 0)
    def _():
        l1_ref[:] = jnp.zeros_like(l1_ref)

    xt = x_ref[0] if x_ref.ndim == 3 else x_ref[:]
    l1 = l1_ref[:]
    for f in range(xt.shape[1]):
        l1 = l1 + jnp.abs(xt[:, f : f + 1] - y_ref[f : f + 1, :])
    l1_ref[:] = l1

    @pl.when(b == nb - 1)
    def _():
        kv = jnp.exp(-l1_ref[:])
        if nt_even:
            active = jnp.logical_or(s < ns - 1, i < nt // 2).astype(f32)
        else:
            active = jnp.float32(1.0)
        mirror_ok = active * (s > 0).astype(f32)
        j = lax.rem(i + s, jnp.int32(nt))
        _laplace_sym_epilogue(
            kv, acc_ref, o2_ref,
            vj_ref[:].astype(f32) * active,
            vi_ref[:].astype(f32) * mirror_ok,
            j, k_real, mirror_mode, k_pad,
        )

    @pl.when(jnp.logical_and(s == ns - 1, b == nb - 1))
    def _():
        o1_ref[:] = acc_ref[:].astype(o1_ref.dtype)


def _laplace_matvec_symmetric(Xs, V, tile, interpret, force_mode=None):
    """Triangle variant of :func:`_laplace_matmat` (X1 is X2, k ≤ 8).

    Measured on-chip at n=65536, d=50, k=1: 108.7 ms vs 144.3 ms general
    (1.33x; the unpipelined per-tile epilogue eats part of the 2x tile
    saving), parity 1.6e-7 vs a host f64 oracle. Takes V of shape
    (n, k): each RHS column owns a (1, T) row of the resident mirror
    window (rows ``j·k + c``), exactly the dot path's VPU mirror layout.
    Returns the PADDED (n_p, k) f32 result; the caller slices.
    """
    n, d = Xs.shape
    k = V.shape[1]
    T = tile
    fb = _laplace_feature_block(d)
    Xp = _pad_axis(_pad_axis(Xs, T, 0), fb, 1)
    Vp = _pad_axis(V.astype(jnp.float32), T, 0)  # (n_p, k)
    n_p, d_p = Xp.shape
    nt = n_p // T
    nb = d_p // fb
    nt_even = nt % 2 == 0
    ns = nt // 2 + 1 if nt_even else (nt + 1) // 2
    if nb == 1:
        x_in = Xp
        x_spec = pl.BlockSpec((T, d_p), lambda i, s, b: (i, 0))
    else:
        x_in = jnp.transpose(Xp.reshape(n_p, nb, fb), (1, 0, 2))
        x_spec = pl.BlockSpec((1, T, fb), lambda i, s, b: (b, i, 0))

    mirror_mode = force_mode or _laplace_sym_mirror_mode(n, k) or "vpu"
    if mirror_mode == "mxu":
        k_win = _round_up(k, 8)
        vi_in = _pad_axis(Vp, k_win, 1).T
        vi_spec = pl.BlockSpec((k_win, T), lambda i, s, b: (0, i))
    else:
        k_win = k
        vi_in = Vp
        vi_spec = pl.BlockSpec((T, k), lambda i, s, b: (i, 0))

    out1, out2 = pl.pallas_call(
        functools.partial(
            _body_sym_laplace, nt=nt, ns=ns, nt_even=nt_even, nb=nb,
            k_real=k, mirror_mode=mirror_mode, k_pad=k_win,
        ),
        grid=(nt, ns, nb),
        in_specs=[
            x_spec,
            pl.BlockSpec((fb, T), lambda i, s, b: (b, (i + s) % nt)),
            pl.BlockSpec((k, T), lambda i, s, b: (0, (i + s) % nt)),
            vi_spec,
        ],
        out_specs=[
            pl.BlockSpec((T, k), lambda i, s, b: (i, 0)),
            pl.BlockSpec((nt * k_win, T), lambda i, s, b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, k), jnp.float32),
            jax.ShapeDtypeStruct((nt * k_win, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, k), jnp.float32),
            pltpu.VMEM((T, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # At mid n (~8k) every operand fits VMEM individually, so XLA
            # hoists them (plus the lane-padded (n,1) result, 128x its real
            # size) into the kernel's scoped allocation and trips the 16 MB
            # default; the hoisting is good (no HBM streaming), so raise
            # the cap instead of fighting it. v5e VMEM is 128 MB.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_p * n_p * d_p // 2,
            bytes_accessed=(n_p * d_p + 6 * n_p) * 4,
            transcendentals=n_p * n_p // 2,
        ),
        interpret=interpret,
    )(x_in, Xp.T, Vp.T, vi_in)
    # mirror window row j·k_win + c holds column c's contribution to tile j
    mirror = out2.reshape(nt, k_win, T).transpose(0, 2, 1).reshape(
        n_p, k_win
    )
    return out1 + mirror[:, :k]


def _body_pair_laplace(
    x_ref, y_ref, vj_ref, vi_ref, o1_ref, o2_ref, acc_ref, l1_ref,
    *, nj, nb, k_real, mirror_mode, k_pad=_LAPLACE_KPAD,
):
    """Two-output rectangular Laplace body (``_body_pair`` for the L1
    feature-blocked engine): the grid is the full (nt1, nt2, nb) slab of
    an off-diagonal band pair, every tile active and mirrored, so the
    circulant masks of ``_body_sym_laplace`` reduce away. One L1/exp tile
    materialization serves both K@V_j → out1[i] and KᵀV_i → the resident
    mirror window (sized by the J band)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)
    f32 = jnp.float32

    @pl.when(
        jnp.logical_and(jnp.logical_and(i == 0, j == 0), b == 0)
    )
    def _():
        o2_ref[:] = jnp.zeros_like(o2_ref)

    @pl.when(jnp.logical_and(j == 0, b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(b == 0)
    def _():
        l1_ref[:] = jnp.zeros_like(l1_ref)

    xt = x_ref[0] if x_ref.ndim == 3 else x_ref[:]
    l1 = l1_ref[:]
    for f in range(xt.shape[1]):
        l1 = l1 + jnp.abs(xt[:, f : f + 1] - y_ref[f : f + 1, :])
    l1_ref[:] = l1

    @pl.when(b == nb - 1)
    def _():
        kv = jnp.exp(-l1_ref[:])
        _laplace_sym_epilogue(
            kv, acc_ref, o2_ref, vj_ref[:].astype(f32),
            vi_ref[:].astype(f32), j, k_real, mirror_mode, k_pad,
        )

    @pl.when(jnp.logical_and(j == nj - 1, b == nb - 1))
    def _():
        o1_ref[:] = acc_ref[:].astype(o1_ref.dtype)


def _laplace_pair_matmat(Xs1, Xs2, V2, V1, tile, interpret,
                         force_mode=None):
    """Laplace instantiation of the pair kernel (see
    :func:`kernel_pair_matmat`): one L1/exp materialization of K_IJ
    serves both products. Returns PADDED f32 (n1_p, k) and (n2_p, k);
    the caller slices and scales."""
    n1, d = Xs1.shape
    n2 = Xs2.shape[0]
    k = V2.shape[1]
    T = tile
    fb = _laplace_feature_block(d)
    Xp1 = _pad_axis(_pad_axis(Xs1, T, 0), fb, 1)
    Xp2 = _pad_axis(_pad_axis(Xs2, T, 0), fb, 1)
    V2p = _pad_axis(V2.astype(jnp.float32), T, 0)
    V1p = _pad_axis(V1.astype(jnp.float32), T, 0)
    n1_p, d_p = Xp1.shape
    n2_p = Xp2.shape[0]
    nt1, nt2 = n1_p // T, n2_p // T
    nb = d_p // fb
    if nb == 1:
        x_in = Xp1
        x_spec = pl.BlockSpec((T, d_p), lambda i, j, b: (i, 0))
    else:
        x_in = jnp.transpose(Xp1.reshape(n1_p, nb, fb), (1, 0, 2))
        x_spec = pl.BlockSpec((1, T, fb), lambda i, j, b: (b, i, 0))

    # the mirror window is sized by the X2 side
    mirror_mode = force_mode or _laplace_sym_mirror_mode(n2, k) or "vpu"
    if mirror_mode == "mxu":
        k_win = _round_up(k, 8)
        vi_in = _pad_axis(V1p, k_win, 1).T
        vi_spec = pl.BlockSpec((k_win, T), lambda i, j, b: (0, i))
    else:
        k_win = k
        vi_in = V1p
        vi_spec = pl.BlockSpec((T, k), lambda i, j, b: (i, 0))

    out1, out2 = pl.pallas_call(
        functools.partial(
            _body_pair_laplace, nj=nt2, nb=nb, k_real=k,
            mirror_mode=mirror_mode, k_pad=k_win,
        ),
        grid=(nt1, nt2, nb),
        in_specs=[
            x_spec,
            pl.BlockSpec((fb, T), lambda i, j, b: (b, j)),
            pl.BlockSpec((k, T), lambda i, j, b: (0, j)),
            vi_spec,
        ],
        out_specs=[
            pl.BlockSpec((T, k), lambda i, j, b: (i, 0)),
            pl.BlockSpec((nt2 * k_win, T), lambda i, j, b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1_p, k), jnp.float32),
            jax.ShapeDtypeStruct((nt2 * k_win, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, k), jnp.float32),
            pltpu.VMEM((T, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_SYM_VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * n1_p * n2_p * d_p,
            bytes_accessed=(
                n1_p * d_p + n2_p * d_p + 4 * (n1_p + n2_p) * k
            ) * 4,
            transcendentals=n1_p * n2_p,
        ),
        interpret=interpret,
    )(x_in, Xp2.T, V2p.T, vi_in)
    mirror = out2.reshape(nt2, k_win, T).transpose(0, 2, 1).reshape(
        n2_p, k_win
    )
    return out1, mirror[:, :k]
