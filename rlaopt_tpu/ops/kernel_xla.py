"""Streaming kernel-Gram matmat — XLA implementation.

Replaces the KeOps LazyTensor engine of the reference (SURVEY §2.2 N10): the
(n, m) kernel matrix is never materialized. Row-blocks of K are formed on the
fly inside a ``lax.map`` loop and immediately contracted with the right-hand
side; peak memory is one (row_block, m) tile. The Pallas implementation
(:mod:`rlaopt_tpu.ops.kernel_pallas`) further keeps tiles in VMEM; this XLA
path is the portable fallback (CPU tests, interpret mode, odd shapes).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from jax import lax

from ..kernels.functions import kernel_tile, scale_inputs


__all__ = ["kernel_matmat_xla"]

# Elements budget for one streamed (row_block × m) tile: 2^23 ≈ 32 MB f32.
_TILE_ELEMENTS = 1 << 23


def _pick_row_block(m: int, requested: Optional[int]) -> int:
    if requested is not None:
        return max(1, requested)
    return max(8, min(4096, _TILE_ELEMENTS // max(m, 1)))


@partial(
    jax.jit,
    static_argnames=("kind", "row_block", "precision"),
)
def kernel_matmat_xla(
    kind: str,
    X1: jax.Array,
    X2: jax.Array,
    V: jax.Array,
    lengthscale,
    const_scaling=1.0,
    row_block: Optional[int] = None,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Compute ``k(X1, X2) @ V`` without materializing the Gram matrix.

    Args:
        kind: kernel family ("rbf", "laplace", "matern12/32/52").
        X1: (n, d) left points.
        X2: (m, d) right points.
        V: (m,) or (m, k) right-hand side.
        lengthscale: float or (d,) ARD lengthscale.
        const_scaling: scalar multiplier on the kernel.
        row_block: streamed tile height (auto from a memory budget if None).
        precision: matmul precision for the distance expansion.

    Returns:
        (n,) or (n, k) product.
    """
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]
    n, d = X1.shape
    m = X2.shape[0]

    Xs = scale_inputs(X1, lengthscale)
    Ys = scale_inputs(X2, lengthscale)

    bm = _pick_row_block(m, row_block)
    nb = -(-n // bm)
    pad = nb * bm - n
    if pad:
        Xs = jnp.concatenate(
            [Xs, jnp.zeros((pad, d), dtype=Xs.dtype)], axis=0
        )
    Xb = Xs.reshape(nb, bm, d)

    def block_fn(xb):
        Kb = kernel_tile(kind, xb, Ys, precision)
        return jnp.matmul(Kb, V, precision=precision)

    out = lax.map(block_fn, Xb).reshape(nb * bm, V.shape[1])[:n]
    out = out * jnp.asarray(const_scaling, out.dtype)
    return out[:, 0] if squeeze else out
