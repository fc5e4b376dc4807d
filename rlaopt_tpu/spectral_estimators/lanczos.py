"""Lanczos tridiagonalization for extremal-eigenvalue estimation.

TPU addition (no reference analog; BASELINE config #5 calls for
Lanczos-based spectral estimation on sharded operators). Fixed iteration
count with full-width ``lax.scan`` — jit/shard_map safe.
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..linops.base import LinOp
from ..utils.checkers import _as_key


__all__ = ["lanczos", "lanczos_eigsh"]


def lanczos(
    A: Union[LinOp, jax.Array],
    num_iters: int,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run ``num_iters`` Lanczos steps on a symmetric operator.

    Returns:
        (alphas (m,), betas (m-1,)): diagonal and off-diagonal of the
        tridiagonal T. Eigenvalues of T approximate extremal eigenvalues of A.
    """
    mv = (lambda v: A @ v) if isinstance(A, LinOp) else (lambda v: A @ v)
    n = A.shape[0]
    dtype = A.dtype
    key = _as_key(key)
    q = jax.random.normal(key, (n,), dtype=dtype)
    q = q / jnp.linalg.norm(q)

    def body(carry, _):
        q_prev, q_cur, beta_prev = carry
        w = mv(q_cur) - beta_prev * q_prev
        alpha = jnp.vdot(q_cur, w)
        w = w - alpha * q_cur
        beta = jnp.linalg.norm(w)
        q_next = w / jnp.where(beta > 0, beta, 1.0)
        return (q_cur, q_next, beta), (alpha, beta)

    init = (jnp.zeros_like(q), q, jnp.asarray(0.0, dtype=dtype))
    _, (alphas, betas) = jax.lax.scan(body, init, None, length=num_iters)
    return alphas, betas[:-1]


def lanczos_eigsh(
    A: Union[LinOp, jax.Array],
    num_iters: int = 20,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Eigenvalues of the Lanczos tridiagonal (sorted ascending)."""
    alphas, betas = lanczos(A, num_iters, key)
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas, k=1)
        + jnp.diag(betas, k=-1)
    )
    return jnp.linalg.eigvalsh(T)
