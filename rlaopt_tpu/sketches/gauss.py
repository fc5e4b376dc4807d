"""Gaussian sketch (parity: ``rlaopt/sketches/gauss.py:18-52``)."""

import jax

from .base import Sketch
from .enums import _SketchSide
from .embeddings import gauss_embedding


__all__ = ["Gauss"]


class Gauss(Sketch):
    """Gaussian sketch: randn(s, d)/sqrt(s), transposed in right mode."""

    def _generate_embedding(self, key: jax.Array):
        Omega = gauss_embedding(key, self.s, self.d, self.dtype)
        if self.mode == _SketchSide.RIGHT:
            Omega = Omega.T
        return Omega
