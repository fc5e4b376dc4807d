"""Identity preconditioner (parity: ``rlaopt/preconditioners/identity.py:9-74``)."""

import jax

from .base import Preconditioner
from .configs import IdentityConfig


__all__ = ["Identity"]


class Identity(Preconditioner):
    """No-op preconditioner: forward and inverse both return the input."""

    def __init__(self, config: IdentityConfig):
        super().__init__(config)

    def _update(self, A, *args, key=None, **kwargs):
        pass

    def _matmul(self, x: jax.Array) -> jax.Array:
        return x

    def _inverse_matmul_1d(self, x: jax.Array) -> jax.Array:
        return x

    def _inverse_matmul_2d(self, x: jax.Array) -> jax.Array:
        return self._inverse_matmul_1d(x)

    def _functional_inverse(self):
        return (lambda state, x: x), ()
