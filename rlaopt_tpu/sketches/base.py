"""Sketch object shell (parity: ``rlaopt/sketches/sketch.py:16-117``).

The classes here wrap the pure generators in
:mod:`rlaopt_tpu.sketches.embeddings` with the reference's stateful API:
construct once (drawing the embedding), then apply on either side, optionally
transposed. Randomness comes from an explicit PRNG ``key`` argument; if
omitted, a key is split off the package-global chain
(:mod:`rlaopt_tpu.utils.rng`), mirroring the reference's implicit torch RNG.
"""

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from .enums import _SketchSide
from ..linops.base import LinOp
from ..utils.checkers import _as_key, _is_pos_int


__all__ = ["Sketch"]


def _lmul(M: jax.Array, x):
    """M @ x where x may be a LinOp (dense at HIGHEST matmul precision)."""
    if isinstance(x, LinOp):
        return x.__rmatmul__(M)
    return jnp.matmul(M, jnp.asarray(x), precision=jax.lax.Precision.HIGHEST)


def _rmul(x, M: jax.Array):
    """x @ M where x may be a LinOp (dense at HIGHEST matmul precision)."""
    if isinstance(x, LinOp):
        return x @ M
    return jnp.matmul(jnp.asarray(x), M, precision=jax.lax.Precision.HIGHEST)


class Sketch(ABC):
    """Abstract base class for sketching operators.

    Attributes:
        mode: _SketchSide.LEFT or .RIGHT.
        s: sketch size.
        d: original dimension.
        dtype: element dtype of the embedding.
        Omega_mat: the materialized embedding matrix — shape (s, d) in left
            mode, (d, s) in right mode.
    """

    def __init__(self, mode, sketch_size: int, matrix_dim: int, dtype, key=None):
        self.mode = _SketchSide._from_str(mode, "mode")
        self.s = sketch_size
        self.d = matrix_dim
        self.dtype = jnp.dtype(dtype)
        _is_pos_int(sketch_size, "sketch_size")
        self.key = _as_key(key)
        self.Omega_mat = self._generate_embedding(self.key)

    @abstractmethod
    def _generate_embedding(self, key: jax.Array) -> jax.Array:
        """Generate the embedding matrix (oriented per ``self.mode``)."""

    def _apply_left(self, x):
        """Omega @ x."""
        return _lmul(self.Omega_mat, x)

    def _apply_right(self, x):
        """x @ Omega."""
        return _rmul(x, self.Omega_mat)

    def _apply_left_trans(self, x):
        """Omega.T @ x."""
        return _lmul(self.Omega_mat.T, x)

    def _apply_right_trans(self, x):
        """x @ Omega.T."""
        return _rmul(x, self.Omega_mat.T)
