"""Orthonormal sketch (parity: ``rlaopt/sketches/ortho.py:18-56``)."""

import jax

from .base import Sketch
from .enums import _SketchSide
from .embeddings import ortho_embedding


__all__ = ["Ortho"]


class Ortho(Sketch):
    """Orthonormal sketch: reduced-QR Q of randn(d, s); transposed in left mode."""

    def _generate_embedding(self, key: jax.Array):
        Omega = ortho_embedding(key, self.s, self.d, self.dtype)  # (d, s)
        if self.mode == _SketchSide.LEFT:
            Omega = Omega.T
        return Omega
