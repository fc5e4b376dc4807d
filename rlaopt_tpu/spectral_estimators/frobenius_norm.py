"""Frobenius-norm estimation (parity: ``rlaopt/spectral_estimators/frobenius_norm.py:9-13``).

Estimates tr(AᵀA) = ‖A‖²_F by Hutchinson on the Gram operator. (The reference
builds the Gram operator with the operator's own — possibly rectangular —
shape; here the Gram is correctly (ncols, ncols).)
"""

from typing import Optional, Tuple, Union

import jax

from .trace import hutchinson
from ..linops.base import LinOp, SymmetricLinOp, TwoSidedLinOp


__all__ = ["fro_norm_est"]


def fro_norm_est(
    A: Union[TwoSidedLinOp, jax.Array],
    k: int,
    sketch: str = "gauss",
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Estimate (‖A‖²_F, variance) via Hutchinson on G = AᵀA."""
    if isinstance(A, LinOp):
        n = A.shape[1]
        G = SymmetricLinOp(
            (n, n), matvec=lambda v: A.T @ (A @ v), dtype=A.dtype
        )
    else:
        G = A.T @ A
    return hutchinson(G, k, sketch, key)
