"""Subsampled Randomized Hadamard Transform (SRHT) sketch.

North-star addition (no reference analog): Θ = sqrt(p/s)·R·H̃·D with the
Hadamard applied as an on-chip FWHT (:mod:`rlaopt_tpu.ops.fwht`, MXU
Kronecker-factor formulation). Applying Θ to an (d, m) array costs
O(p·m·log-ish) instead of the O(s·d·m) of a dense Gaussian sketch, and never
materializes the (s, d) matrix. Dense-array operands take the fast-transform
path; LinOp operands fall back to the materialized matrix (lazily built).
"""

import jax
import jax.numpy as jnp

from .base import Sketch, _lmul, _rmul
from .enums import _SketchSide
from .embeddings import srht_apply, srht_matrix, srht_params
from ..linops.base import LinOp


__all__ = ["SRHT"]


class SRHT(Sketch):
    """SRHT sketch. Conceptual shape: (s, d) in left mode, (d, s) in right."""

    def __init__(self, mode, sketch_size, matrix_dim, dtype, key=None):
        self._materialized = None
        super().__init__(mode, sketch_size, matrix_dim, dtype, key)

    def _generate_embedding(self, key: jax.Array):
        self.signs, self.rows = srht_params(key, self.s, self.d, self.dtype)
        return None  # materialized lazily via the Omega_mat property

    @property
    def Omega_mat(self) -> jax.Array:
        if self._materialized is None:
            Theta = srht_matrix(self.signs, self.rows, self.d)  # (s, d)
            if self.mode == _SketchSide.RIGHT:
                Theta = Theta.T
            self._materialized = Theta
        return self._materialized

    @Omega_mat.setter
    def Omega_mat(self, value):
        self._materialized = value

    # Θ applied along axis 0; Θᵀ y computed through the materialized matrix
    # only when unavoidable (LinOp operands).
    def _theta(self, x):
        return srht_apply(self.signs, self.rows, x)

    def _apply_left(self, x):
        """Omega @ x."""
        if self.mode == _SketchSide.LEFT and not isinstance(x, LinOp):
            return self._theta(jnp.asarray(x))
        return _lmul(self.Omega_mat, x)

    def _apply_right(self, x):
        """x @ Omega."""
        if self.mode == _SketchSide.RIGHT and not isinstance(x, LinOp):
            # x @ Θᵀ = (Θ xᵀ)ᵀ
            x = jnp.asarray(x)
            return self._theta(x.T).T if x.ndim == 2 else self._theta(x)
        return _rmul(x, self.Omega_mat)

    def _apply_left_trans(self, x):
        """Omega.T @ x."""
        if self.mode == _SketchSide.RIGHT and not isinstance(x, LinOp):
            return self._theta(jnp.asarray(x))
        return _lmul(self.Omega_mat.T, x)

    def _apply_right_trans(self, x):
        """x @ Omega.T."""
        if self.mode == _SketchSide.LEFT and not isinstance(x, LinOp):
            x = jnp.asarray(x)
            return self._theta(x.T).T if x.ndim == 2 else self._theta(x)
        return _rmul(x, self.Omega_mat.T)
