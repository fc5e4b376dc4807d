"""Newton preconditioner.

Parity: ``rlaopt/preconditioners/newton.py:8-88`` — ``L = chol(A + ρI)``,
forward ``L(Lᵀx)``, inverse via two triangular solves. Functional core
(:func:`newton_update`, :func:`newton_apply`, :func:`newton_apply_inv`) is
jit/scan-safe for use inside compiled solver loops (e.g. SAP block
preconditioners).
"""

import jax
import jax.numpy as jnp

from .base import Preconditioner
from .configs import NewtonConfig
from ..utils.linalg import densify, hmm, solve_tri_lower, solve_tri_upper


__all__ = ["Newton", "newton_update", "newton_apply", "newton_apply_inv"]


# -- functional core ---------------------------------------------------------
def newton_update(A_dense: jax.Array, rho) -> jax.Array:
    """Cholesky factor of A + ρI (lower)."""
    n = A_dense.shape[0]
    shifted = A_dense + rho * jnp.eye(n, dtype=A_dense.dtype)
    return jnp.linalg.cholesky(shifted)


def newton_apply(L: jax.Array, x: jax.Array) -> jax.Array:
    """P x = L (Lᵀ x)."""
    return hmm(L, hmm(L.T, x))


def newton_apply_inv(L: jax.Array, x: jax.Array) -> jax.Array:
    """P⁻¹ x via two triangular solves."""
    unsqueeze = x.ndim == 1
    x_in = x[:, None] if unsqueeze else x
    y = solve_tri_lower(L, x_in)
    out = solve_tri_upper(L.T, y)
    return out[:, 0] if unsqueeze else out


# -- OO shell -----------------------------------------------------------------
class Newton(Preconditioner):
    """Exact (damped) Newton preconditioner.

    Attributes:
        L: lower Cholesky factor of A + ρI.
    """

    def __init__(self, config: NewtonConfig):
        super().__init__(config)
        self.L = None

    def _update(self, A, *args, key=None, **kwargs):
        A_dense = densify(A)
        self.L = newton_update(A_dense, self.config.rho)

    def _matmul(self, x):
        return newton_apply(self.L, x)

    def _inverse_matmul_1d(self, x):
        return newton_apply_inv(self.L, x)

    def _inverse_matmul_2d(self, x):
        return newton_apply_inv(self.L, x)

    def _functional_inverse(self):
        return newton_apply_inv, self.L
