"""Preconditioner ABC and inverse wrapper.

Parity: ``rlaopt/preconditioners/preconditioner.py:19-180``. The OO shell here
is stateful for API familiarity; each concrete preconditioner also exposes a
pure functional core (``*_update`` / ``*_apply`` / ``*_apply_inv`` functions in
its module) that is jit/scan-safe — solvers use the functional core inside
compiled loops.
"""

from abc import ABC, abstractmethod
from typing import Callable

import jax

from .configs import PreconditionerConfig
from ..utils.checkers import _is_array_1d_2d


__all__ = ["Preconditioner"]


class Preconditioner(ABC):
    """Abstract base class for preconditioners.

    Attributes:
        config: the preconditioner configuration.
    """

    def __init__(self, config: PreconditionerConfig):
        self.config = config

    @abstractmethod
    def _update(self, A, *args, key=None, **kwargs):
        """(Re)build the preconditioner from a matrix or LinOp ``A``.

        Args:
            A: dense matrix or LinOp.
            key: PRNG key for randomized constructions (int / key / None).
        """

    @abstractmethod
    def _matmul(self, x: jax.Array) -> jax.Array:
        """P @ x."""

    @abstractmethod
    def _inverse_matmul_1d(self, x: jax.Array) -> jax.Array:
        """P^{-1} x for 1D x."""

    @abstractmethod
    def _inverse_matmul_2d(self, x: jax.Array) -> jax.Array:
        """P^{-1} X for 2D X."""

    def __matmul__(self, x: jax.Array) -> jax.Array:
        _is_array_1d_2d(x, "x")
        return self._matmul(x)

    def _inverse_matmul(self, x: jax.Array) -> jax.Array:
        _is_array_1d_2d(x, "x")
        if x.ndim == 1:
            return self._inverse_matmul_1d(x)
        return self._inverse_matmul_2d(x)

    def _inverse_matmul_compose(self, fn: Callable) -> Callable:
        """Return ``x ↦ P^{-1} fn(x)``."""

        def composed_fn(*args, **kwargs):
            return self._inverse_matmul(fn(*args, **kwargs))

        return composed_fn

    def _update_damping(self, baseline_rho: float):
        """Adjust damping after build; no-op except for Nyström."""
        pass

    @property
    def _inv(self) -> "_InvPreconditioner":
        return _InvPreconditioner(self)

    def _functional_inverse(self):
        """Return a jit-safe pure pair ``(apply_inv_fn, state_pytree)``.

        ``apply_inv_fn(state, x)`` computes P⁻¹x; ``state_pytree`` holds the
        array payloads. Solvers thread the state through compiled loops so the
        preconditioner apply fuses into the iteration body.
        """
        raise NotImplementedError(
            f"{type(self).__name__} does not expose a functional inverse"
        )


class _InvPreconditioner:
    """Wrapper providing ``P._inv @ x`` syntax."""

    def __init__(self, preconditioner: Preconditioner):
        self.preconditioner = preconditioner

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return self.preconditioner._inverse_matmul(x)
