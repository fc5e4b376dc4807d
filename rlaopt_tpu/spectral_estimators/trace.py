"""Hutchinson-type trace estimators.

Parity: ``rlaopt/spectral_estimators/trace.py:12-24``, with two fixes:

* the reference passes no dtype through to the sketch factory (its
  ``get_sketch`` call drops an argument) — here the dtype is taken from A;
* the reference's variance formula ``1/(k-1)·Σ(k·dᵢ − trace)`` telescopes to
  zero identically — here the sample variance of the k single-probe
  estimators ``eᵢ = k·dᵢ`` is returned instead.

``hutch_plus_plus`` — a bare stub in the reference (``trace.py:23-24``) — is
fully implemented (Hutch++: low-rank deflation + Hutchinson on the residual).
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..linops.base import LinOp
from ..sketches.embeddings import left_embedding
from ..utils.checkers import _as_key
from ..utils.linalg import hmm


__all__ = ["hutchinson", "hutch_plus_plus"]


def _lmul(M, A):
    """M @ A with A possibly a LinOp."""
    if isinstance(A, LinOp):
        return A.__rmatmul__(M)
    return hmm(M, jnp.asarray(A))


def hutchinson(
    A: Union[LinOp, jax.Array],
    k: int,
    sketch: str = "gauss",
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Estimate tr(A) for symmetric A with k random probes.

    Use "gauss" or "sparse" sketches (isotropic in expectation); "ortho"
    probes are not scaled for trace estimation.

    Returns:
        (trace_estimate, sample_variance) — variance of the k single-probe
        estimators around the mean.
    """
    n = A.shape[0]
    dtype = A.dtype if hasattr(A, "dtype") else jnp.asarray(A).dtype
    Omega = left_embedding(sketch, _as_key(key), k, n, dtype)  # (k, n)
    OA = _lmul(Omega, A)  # (k, n)
    d = jnp.einsum("kn,kn->k", OA, Omega)  # diag(Ω A Ωᵀ)
    trace = jnp.sum(d)
    e = k * d  # per-probe estimators
    var = jnp.sum((e - trace) ** 2) / (k - 1)
    return trace, var


def hutch_plus_plus(
    A: Union[LinOp, jax.Array],
    k: int,
    sketch: str = "gauss",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Hutch++ trace estimator (Meyer et al. 2021).

    Splits the k matvecs as k/3 range-finding, k/3 deflated trace (exact on
    the captured subspace), k/3 Hutchinson on the residual. Variance decays
    O(1/k²) for PSD A versus Hutchinson's O(1/k).
    """
    n = A.shape[0]
    dtype = A.dtype if hasattr(A, "dtype") else jnp.asarray(A).dtype
    key = _as_key(key)
    k1, k2 = jax.random.split(key)
    m = max(k // 3, 1)

    def amat(X):
        return A @ X if isinstance(A, LinOp) else hmm(jnp.asarray(A), X)

    # Range finder
    S = jax.random.normal(k1, (n, m), dtype=dtype)
    Q, _ = jnp.linalg.qr(amat(S), mode="reduced")
    # Exact trace on the captured subspace
    t_defl = jnp.trace(hmm(Q.T, amat(Q)))
    # Hutchinson on the residual (I − QQᵀ)A(I − QQᵀ)
    G = jax.random.normal(k2, (n, m), dtype=dtype)
    G = G - hmm(Q, hmm(Q.T, G))
    t_resid = jnp.trace(hmm(G.T, amat(G))) / m
    return t_defl + t_resid
