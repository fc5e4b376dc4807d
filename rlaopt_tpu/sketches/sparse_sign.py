"""Sparse-sign sketch (parity: ``rlaopt/sketches/sparse.py:18-76``)."""

import jax

from .base import Sketch
from .enums import _SketchSide
from .embeddings import sparse_sign_embedding


__all__ = ["Sparse"]


class Sparse(Sketch):
    """Sparse-sign sketch: ζ=min(8,s) ±1 entries per column, scaled ζ^(-1/2).

    Stored dense (like the reference); on TPU the apply is a plain matmul,
    which the MXU handles faster than any sparse gather at these sizes.
    """

    def _generate_embedding(self, key: jax.Array):
        Omega = sparse_sign_embedding(key, self.s, self.d, self.dtype)
        if self.mode == _SketchSide.RIGHT:
            Omega = Omega.T
        return Omega
