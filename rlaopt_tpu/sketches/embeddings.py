"""Pure functional sketch embedding generators.

These are the jit-safe core used both by the object shell
(:mod:`rlaopt_tpu.sketches.base`) and directly inside jitted solver loops
(e.g. per-block Nyström construction in SAP, where a sketch must be drawn
every iteration under ``lax.scan``).

Formulas match the reference generators:
* Gaussian  — ``randn(s, d)/sqrt(s)``      (``rlaopt/sketches/gauss.py:47-50``)
* Ortho     — reduced-QR Q of ``randn(d, s)`` (``rlaopt/sketches/ortho.py:52-55``)
* SparseSign — ζ=min(8,s) ±1 entries per column, scaled ζ^(-1/2)
               (``rlaopt/sketches/sparse.py:55-74``)
* SRHT      — new (north-star addition): ``sqrt(p/s) · R · H̃ · D`` with
              on-chip FWHT, p = next_pow2(d).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.fwht import fwht, next_pow2


__all__ = [
    "gauss_embedding",
    "ortho_embedding",
    "sparse_sign_embedding",
    "srht_params",
    "srht_apply",
    "srht_matrix",
    "left_embedding",
    "right_embedding",
    "sketch_apply_left",
]


def gauss_embedding(key: jax.Array, s: int, d: int, dtype=jnp.float32) -> jax.Array:
    """Gaussian embedding (s, d), scaled so E[ΩᵀΩ] = I."""
    return jax.random.normal(key, (s, d), dtype=dtype) / jnp.sqrt(
        jnp.asarray(s, dtype)
    )


def ortho_embedding(key: jax.Array, s: int, d: int, dtype=jnp.float32) -> jax.Array:
    """Orthonormal embedding: reduced-QR Q factor of randn(d, s), shape (d, s).

    Columns are exactly orthonormal (requires s <= d).
    """
    G = jax.random.normal(key, (d, s), dtype=dtype)
    Q, _ = jnp.linalg.qr(G, mode="reduced")
    return Q


def sparse_sign_embedding(
    key: jax.Array, s: int, d: int, dtype=jnp.float32
) -> jax.Array:
    """Sparse-sign embedding (s, d): ζ=min(8,s) ±1 per column, scaled ζ^(-1/2).

    Matches the reference exactly, including the collision semantics of
    scatter (duplicate row draws within a column overwrite, leaving fewer
    than ζ nonzeros) — ``rlaopt/sketches/sparse.py:55-74``.
    """
    zeta = 8 if s >= 8 else s
    k_sign, k_row = jax.random.split(key)
    z = 2.0 * jax.random.bernoulli(k_sign, 0.5, (zeta, d)).astype(dtype) - 1.0
    rows = jax.random.randint(k_row, (zeta, d), 0, s)
    cols = jnp.broadcast_to(jnp.arange(d)[None, :], (zeta, d))
    Omega = jnp.zeros((s, d), dtype=dtype)
    Omega = Omega.at[rows, cols].set(z)
    return Omega * (zeta**-0.5)


def srht_params(
    key: jax.Array, s: int, d: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Draw SRHT randomness: (signs (p,), row_idx (s,)) with p = next_pow2(d)."""
    p = next_pow2(d)
    k_sign, k_rows = jax.random.split(key)
    signs = 2.0 * jax.random.bernoulli(k_sign, 0.5, (p,)).astype(dtype) - 1.0
    rows = jax.random.permutation(k_rows, p)[:s]
    return signs, rows


def srht_apply(signs: jax.Array, rows: jax.Array, A: jax.Array) -> jax.Array:
    """Apply Θ = sqrt(p/s)·R·H̃·D·E to A along axis 0: (d, ...) → (s, ...).

    ``E`` zero-pads d → p = next_pow2(d); ``H̃ = H/sqrt(p)`` is the normalized
    Hadamard so that E[ΘᵀΘ] = I.
    """
    p = signs.shape[0]
    s = rows.shape[0]
    d = A.shape[0]
    vec = A.ndim == 1
    if vec:
        A = A[:, None]
    X = A * signs[:d, None]
    if p != d:
        X = jnp.concatenate(
            [X, jnp.zeros((p - d,) + X.shape[1:], dtype=X.dtype)], axis=0
        )
    Y = fwht(X, axis=0) / jnp.sqrt(jnp.asarray(p, X.dtype))
    Y = Y[rows] * jnp.sqrt(jnp.asarray(p / s, X.dtype))
    return Y[:, 0] if vec else Y


def srht_matrix(signs: jax.Array, rows: jax.Array, d: int) -> jax.Array:
    """Materialize the (s, d) SRHT matrix.

    Selected Hadamard rows are built directly via the bit identity
    ``H[r, c] = (-1)^popcount(r & c)`` (Sylvester order) — O(s·p) memory,
    never the p×p transform of an identity.
    """
    p = signs.shape[0]
    s = rows.shape[0]
    cols = jnp.arange(p, dtype=jnp.uint32)
    bits = jax.lax.population_count(rows.astype(jnp.uint32)[:, None] & cols[None, :])
    H_sel = (1.0 - 2.0 * (bits & 1).astype(signs.dtype))  # (s, p)
    scale = jnp.sqrt(jnp.asarray(p / s, signs.dtype)) / jnp.sqrt(
        jnp.asarray(p, signs.dtype)
    )
    Theta = H_sel * signs[None, :] * scale
    return Theta[:, :d]


def sketch_apply_left(name: str, key: jax.Array, s: int, A, dtype) -> jax.Array:
    """Compute Ω @ A for the named left-mode sketch, structure-exploiting.

    For SRHT with a dense operand this is the fast transform (never
    materializes the (s, d) matrix — essential at d ~ 1e5+); other families
    materialize the embedding and matmul. ``A`` may be a LinOp.
    """
    from .enums import _SketchMode
    from ..linops.base import LinOp
    from ..utils.linalg import hmm

    mode = _SketchMode._from_str(name, "name")
    d = A.shape[0]
    if mode == _SketchMode.SRHT and not isinstance(A, LinOp):
        signs, rows = srht_params(key, s, d, dtype)
        return srht_apply(signs, rows, jnp.asarray(A))
    Omega = left_embedding(name, key, s, d, dtype)
    if isinstance(A, LinOp):
        return A.__rmatmul__(Omega)
    return hmm(Omega, jnp.asarray(A))


def left_embedding(name: str, key: jax.Array, s: int, d: int, dtype) -> jax.Array:
    """Materialized left-mode (s, d) embedding for the named sketch family.

    jit-safe; used by the functional preconditioner cores.
    """
    from .enums import _SketchMode

    mode = _SketchMode._from_str(name, "name")
    if mode == _SketchMode.GAUSS:
        return gauss_embedding(key, s, d, dtype)
    if mode == _SketchMode.ORTHO:
        return ortho_embedding(key, s, d, dtype).T
    if mode == _SketchMode.SPARSE:
        return sparse_sign_embedding(key, s, d, dtype)
    signs, rows = srht_params(key, s, d, dtype)
    return srht_matrix(signs, rows, d)


def right_embedding(name: str, key: jax.Array, s: int, d: int, dtype) -> jax.Array:
    """Materialized right-mode (d, s) embedding for the named sketch family."""
    from .enums import _SketchMode

    mode = _SketchMode._from_str(name, "name")
    if mode == _SketchMode.ORTHO:
        return ortho_embedding(key, s, d, dtype)
    return left_embedding(name, key, s, d, dtype).T
