"""Spectral-norm estimation via randomized power iteration.

Parity: ``rlaopt/spectral_estimators/spectral_norm.py:11-29`` — same
initialization (normalized Gaussian start), same convergence rule
(stop when |σ_new − σ| ≤ rtol·σ or at max_iters), same return (σ_new, v).
Implemented as a ``lax.while_loop`` so it is jit/scan-safe — SAP calls this
every iteration inside a compiled loop for its stepsize.
"""

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..linops.base import LinOp
from ..utils.checkers import _as_key


__all__ = ["randomized_powering"]


def _as_mv(A) -> Tuple[Callable, int, object]:
    if isinstance(A, LinOp):
        return (lambda v: A @ v), A.shape[0], A.dtype
    A = jnp.asarray(A)
    return (lambda v: A @ v), A.shape[0], A.dtype


def randomized_powering(
    A: Union[LinOp, jax.Array],
    max_iters: int = 10,
    rtol: float = 1e-3,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Estimate λ_max of a symmetric(-izable) operator by power iteration.

    Args:
        A: symmetric LinOp or dense matrix. (As in the reference, P⁻¹A with
            symmetric P and A is admissible: its spectrum matches
            P^{-1/2} A P^{-1/2}.)
        max_iters: iteration cap.
        rtol: relative convergence tolerance on the eigenvalue estimate.
        key: PRNG key for the random start vector.

    Returns:
        (sigma, v): the eigenvalue estimate and final unit vector.
    """
    mv, d, dtype = _as_mv(A)
    key = _as_key(key)
    omega = jax.random.normal(key, (d,), dtype=dtype)
    v0 = omega / jnp.linalg.norm(omega)

    def cond(carry):
        i, v, sig, err = carry
        return jnp.logical_and(i < max_iters, err > rtol * sig)

    def body(carry):
        i, v, sig, err = carry
        v_new = mv(v)
        sig_new = jnp.vdot(v, v_new)
        v = v_new / jnp.linalg.norm(v_new)
        err = jnp.abs(sig_new - sig)
        return (i + 1, v, sig_new, err)

    init = (
        jnp.asarray(0),
        v0,
        jnp.asarray(0.0, dtype=dtype),
        jnp.asarray(jnp.inf, dtype=dtype),
    )
    _, v, sig, _ = jax.lax.while_loop(cond, body, init)
    return sig, v
