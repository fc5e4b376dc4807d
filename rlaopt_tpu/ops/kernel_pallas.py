"""Fused blockwise kernel-Gram matvec — Pallas TPU kernel.

The performance-critical replacement for the reference's KeOps engine
(SURVEY §2.2 N10). One kernel computes ``out = c·k(X1, X2) @ V`` without the
(n, m) Gram matrix ever leaving VMEM:

* grid = (row tiles × col tiles); the col-tile dimension is sequential and
  accumulates into a VMEM scratch tile, so each (TM, TN) kernel tile lives
  only inside the kernel body;
* squared-distance kernels (RBF / Matérn) compute the tile via the MXU
  expansion ``‖x‖² + ‖y‖² − 2·x·yᵀ`` — the dominant FLOPs run on the
  systolic array — then apply the transcendental on the VPU and contract
  with the RHS tile on the MXU again;
* the Laplace (L1) kernel loops features on the VPU (no matmul form exists);
* inputs are pre-scaled by the lengthscale (ARD included) outside the kernel;
  row/col/feature padding is zero-filled, which is exact: zero features don't
  change distances, padded RHS rows are zero, padded output rows are sliced.

``compute_dtype`` selects the cross-term speed/accuracy tier (measured on
the round-1 chip at n=m=16384, d=256):

=============  ==========================  ===================
value           accuracy (rel, vs f64-ish)  throughput
=============  ==========================  ===================
None (default)  3e-7 (exact f32)            14.8 TFLOP/s
"bf16x3"        8e-7 (split-precision)      18.8 TFLOP/s
"bfloat16"      4e-3                        31.9 TFLOP/s
=============  ==========================  ===================
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.functions import scale_inputs


__all__ = ["kernel_matmat_pallas"]

_SQRT3 = 3.0**0.5
_SQRT5 = 5.0**0.5


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


def _tile_formula(kind, xi, xjT, compute_dtype, direct_d=None):
    """Evaluate the kernel tile k(xi, xj) for one (TM, TN) block.

    ``xjT`` is the column-tile in (d, TN) orientation so the cross term is a
    natural (TM, d) @ (d, TN) MXU matmul — no per-tile transpose.
    ``direct_d``: when set, compute squared distances with the exact VPU
    path over that many features instead of the MXU expansion.
    """
    f32 = jnp.float32
    if kind == "laplace":
        tm, tn = xi.shape[0], xjT.shape[1]
        d_iter = direct_d if direct_d is not None else xi.shape[1]
        l1 = jnp.zeros((tm, tn), dtype=f32)
        for f in range(d_iter):  # static unroll (see _sqdist_direct)
            l1 = l1 + jnp.abs(xi[:, f : f + 1] - xjT[f : f + 1, :])
        return jnp.exp(-l1)

    if direct_d is not None:
        d2 = _sqdist_direct(xi, xjT, direct_d)
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

    xn = jnp.sum(xi.astype(f32) ** 2, axis=1, keepdims=True)  # (TM, 1)
    yn = jnp.sum(xjT.astype(f32) ** 2, axis=0, keepdims=True)  # (1, TN)
    dn = (((1,), (0,)), ((), ()))
    if compute_dtype == "bf16x3":
        # Manual 3-pass split precision (Mosaic rejects Precision.HIGH):
        # x = hi + lo in bf16 pairs; x·y ≈ hi·hi + hi·lo + lo·hi — near-f32
        # accuracy at ~2x the 6-pass HIGHEST throughput.
        bf16 = jnp.bfloat16
        xi_hi = xi.astype(bf16)
        xi_lo = (xi - xi_hi.astype(f32)).astype(bf16)
        yj_hi = xjT.astype(bf16)
        yj_lo = (xjT - yj_hi.astype(f32)).astype(bf16)
        cross = (
            jax.lax.dot_general(xi_hi, yj_hi, dn, preferred_element_type=f32)
            + jax.lax.dot_general(xi_hi, yj_lo, dn, preferred_element_type=f32)
            + jax.lax.dot_general(xi_lo, yj_hi, dn, preferred_element_type=f32)
        )
    else:
        if compute_dtype is not None:
            xi = xi.astype(compute_dtype)
            xjT = xjT.astype(compute_dtype)
            precision = None
        else:
            # Explicit HIGHEST: the runtime may set
            # --xla_allow_excess_precision, which silently demotes f32 dots
            # to bf16 — ~1e-2 kernel-value noise that stalls CG solves
            # around 1e-2 relative residual.
            precision = lax.Precision.HIGHEST
        cross = jax.lax.dot_general(
            xi,
            xjT,
            dimension_numbers=dn,
            preferred_element_type=f32,
            precision=precision,
        )  # (TM, TN)
    d2 = jnp.maximum(xn + yn - 2.0 * cross, 0.0)
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


def _kernel_body(
    x1_ref, x2_ref, v_ref, o_ref, acc_ref, *, kind, nj, compute_dtype,
    direct_d=None,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_tile = _tile_formula(
        kind, x1_ref[:], x2_ref[:], compute_dtype, direct_d=direct_d
    )
    if compute_dtype is None or compute_dtype == "bf16x3":
        acc_precision = jax.lax.Precision.HIGHEST
    else:
        acc_precision = None
    acc_ref[:] += jax.lax.dot_general(
        k_tile,
        v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=acc_precision,
    )

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_axis(x, multiple, axis):
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "tile_m", "tile_n", "compute_dtype", "interpret"),
)
def kernel_matmat_pallas(
    kind: str,
    X1: jax.Array,
    X2: jax.Array,
    V: jax.Array,
    lengthscale,
    const_scaling=1.0,
    tile_m: int = 256,
    tile_n: int = 512,
    compute_dtype: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``c·k(X1, X2) @ V`` on TPU (see module docstring).

    Args mirror :func:`rlaopt_tpu.ops.kernel_xla.kernel_matmat_xla`; extra
    knobs: tile sizes and the optional bf16 fast path.
    """
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]
    n, d = X1.shape
    m = X2.shape[0]
    k = V.shape[1]

    Xs = scale_inputs(X1, lengthscale)
    Ys = scale_inputs(X2, lengthscale)

    # Laplace tiles are VPU-bound; keep them small.
    if kind == "laplace":
        tile_m, tile_n = min(tile_m, 256), min(tile_n, 256)

    Xs = _pad_axis(_pad_axis(Xs, tile_m, 0), 128, 1)
    Ys = _pad_axis(_pad_axis(Ys, tile_n, 0), 128, 1)
    YsT = Ys.T  # (d_p, m_p): natural MXU orientation for the cross matmul
    Vp = _pad_axis(_pad_axis(V, tile_n, 0), 8, 1)
    n_p, d_p = Xs.shape
    m_p = Ys.shape[0]
    k_p = Vp.shape[1]
    ni, nj = n_p // tile_m, m_p // tile_n

    if compute_dtype is None or compute_dtype == "bf16x3":
        cd = compute_dtype
    else:
        cd = jnp.dtype(compute_dtype)
    # Small-d accurate path: exact VPU squared distances beat the 128-padded
    # HIGHEST-precision MXU expansion and dodge excess-precision demotion.
    # Laplace always iterates features; cap its unroll at the true d.
    if kind == "laplace":
        direct_d = d
    else:
        direct_d = d if (cd in (None, "bf16x3") and d <= 32) else None
    body = functools.partial(
        _kernel_body,
        kind=kind,
        nj=nj,
        compute_dtype=cd,
        direct_d=direct_d,
    )

    out = pl.pallas_call(
        body,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((tile_m, d_p), lambda i, j: (i, 0)),
            pl.BlockSpec((d_p, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((tile_n, k_p), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, k_p), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_p, k_p), V.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, k_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * m_p * (d_p + k_p),
            bytes_accessed=(n_p * d_p + m_p * d_p + m_p * k_p + n_p * k_p) * 4,
            transcendentals=n_p * m_p,
        ),
        interpret=interpret,
    )(Xs, YsT, Vp)

    out = out[:n, :k] * jnp.asarray(const_scaling, V.dtype)
    return out[:, 0] if squeeze else out
