"""Small linear-algebra helpers shared by preconditioners/solvers."""

from functools import partial

import jax
import jax.numpy as jnp

from jax import lax


__all__ = ["hmm", "as_matmat", "densify", "solve_tri_lower", "solve_tri_upper"]


def hmm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Highest-precision matmul.

    Preconditioner factorizations and solver inner products are numerically
    sensitive; on TPU the default f32 matmul runs with bf16 passes, so force
    the fp32-accurate 6-pass mode there (no-op for f64 on CPU).
    """
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def as_matmat(A):
    """Return a matmat callable for a dense matrix or LinOp."""
    from ..linops.base import LinOp

    if isinstance(A, LinOp):
        return lambda X: A @ X
    A = jnp.asarray(A)
    return partial(hmm, A)


def densify(A, dtype=None) -> jax.Array:
    """Densify a dense matrix or LinOp via ``A @ I``.

    (Reference pattern: ``preconditioners/newton.py:63``.)
    """
    from ..linops.base import LinOp

    if isinstance(A, LinOp):
        return A @ jnp.eye(A.shape[1], dtype=dtype or A.dtype)
    return jnp.asarray(A)


def solve_tri_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L x = b with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def solve_tri_upper(U: jax.Array, b: jax.Array) -> jax.Array:
    """Solve U x = b with U upper-triangular."""
    return jax.scipy.linalg.solve_triangular(U, b, lower=False)
