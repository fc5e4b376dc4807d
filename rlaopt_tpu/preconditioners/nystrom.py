"""Randomized Nyström preconditioner.

Parity: ``rlaopt/preconditioners/nystrom.py:11-152``, including:

* eps·trace(Core) stabilization shift before the core Cholesky
  (reference lines 85-92),
* the fp32-stability inverse path via an extra Cholesky of
  ``ρ·diag(S⁻¹) + UᵀU`` (reference lines 112-132), taken whenever the
  operator dtype is not float64 — mandatory on TPU where fp64 is impractical,
* adaptive damping ``ρ ← baseline + S[-1]`` (reference lines 140-152).

The functional core is jit/scan-safe; SAP builds one of these per iteration
inside a compiled loop.
"""

import warnings
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .base import Preconditioner
from .configs import NystromConfig
from .enums import _DampingMode
from ..sketches.embeddings import right_embedding
from ..utils.checkers import _as_key
from ..utils.linalg import as_matmat, hmm, solve_tri_lower, solve_tri_upper


__all__ = [
    "Nystrom",
    "NystromFactors",
    "nystrom_update",
    "nystrom_damping",
    "nystrom_inv_chol",
    "nystrom_apply",
    "nystrom_apply_inv",
]


class NystromFactors(NamedTuple):
    """Rank-r Nyström eigen-factors: A ≈ U diag(S) Uᵀ."""

    U: jax.Array  # (n, r) left singular vectors
    S: jax.Array  # (r,)  nonneg eigenvalue estimates


# -- functional core ---------------------------------------------------------
def nystrom_update(
    A_mm, n: int, rank: int, sketch: str, key, dtype, _route=None
) -> NystromFactors:
    """Build the Nyström approximation of an SPD operator.

    Args:
        A_mm: callable X ↦ A @ X (n×r matmat through the operator).
        n: operator dimension.
        rank: sketch rank r.
        sketch: sketch family name for the range finder.
        key: PRNG key.
        dtype: element dtype.
        _route: test hook — force "eigh" or "svd" instead of the n > 64·rank
            size heuristic, so both factorization branches can be compared on
            the identical problem.
    """
    if rank > n:
        # A rank-n Nyström of an n-dim SPD operator is already exact; a wider
        # sketch only produces a rank-deficient core (and shape blow-ups
        # downstream, e.g. SAP blocks smaller than the configured rank).
        warnings.warn(
            f"Nyström sketch rank {rank} exceeds the operator dimension "
            f"{n}; clamping to {n} (rank-n is already exact).",
            stacklevel=2,
        )
        rank = n
    Omega = right_embedding(sketch, key, rank, n, dtype)  # (n, r)
    Y = A_mm(Omega)  # (n, r)
    Core = hmm(Omega.T, Y)  # (r, r)
    shift = jnp.finfo(dtype).eps * jnp.trace(Core)
    Core = Core + shift * jnp.eye(rank, dtype=dtype)
    L = jnp.linalg.cholesky(Core)
    B = solve_tri_lower(L, Y.T)  # (r, n)
    use_eigh = n > 64 * rank if _route is None else _route == "eigh"
    if use_eigh:
        # Tall case: an (n, r) SVD materializes several O(n·r) workspaces —
        # at n=1e6, r=500 that crashed the TPU worker (HBM OOM). The r×r
        # Gram-eigh route needs only one extra (n, r) product:
        # B Bᵀ = V diag(σ²) Vᵀ  ⇒  U = Bᵀ V diag(1/σ).
        G = hmm(B, B.T)  # (r, r)
        evals, V = jnp.linalg.eigh(G)  # ascending
        evals = evals[::-1]
        V = V[:, ::-1]
        sig = jnp.sqrt(jnp.maximum(evals, jnp.zeros((), dtype)))
        inv_sig = jnp.where(
            sig > jnp.finfo(dtype).eps * jnp.max(sig), 1.0 / sig, 0.0
        )
        U = hmm(B.T, V * inv_sig[None, :])
        S = jnp.maximum(evals - shift, jnp.zeros((), dtype=dtype))
        return NystromFactors(U=U, S=S)
    U, Svals, _ = jnp.linalg.svd(B.T, full_matrices=False)
    S = jnp.maximum(Svals**2 - shift, jnp.zeros((), dtype=dtype))
    return NystromFactors(U=U, S=S)


def nystrom_damping(S: jax.Array, rho, baseline_rho, adaptive: bool):
    """Final damping: baseline + λ_min(approx) in adaptive mode, else rho."""
    if adaptive:
        return baseline_rho + S[-1]
    return rho


def nystrom_inv_chol(U: jax.Array, S: jax.Array, rho) -> jax.Array:
    """fp32-stability factor: chol(ρ·diag(S⁻¹) + UᵀU) (reference 119-122).

    Stability fix over the reference: S entries that hit the max(σ²−shift, 0)
    floor are exactly zero, making ρ·S⁻¹ infinite and the Cholesky NaN (the
    reference crashes here). Clamping S at eps·ρ leaves non-degenerate
    directions untouched (clamp ≪ ρ) and makes degenerate ones contribute the
    correct 1/ρ to the inverse.
    """
    dtype = S.dtype
    floor = jnp.finfo(dtype).eps * jnp.maximum(
        jnp.asarray(rho, dtype), jnp.finfo(dtype).tiny
    )
    S_safe = jnp.maximum(S, floor)
    M = rho * jnp.diag(S_safe**-1.0) + hmm(U.T, U)
    return jnp.linalg.cholesky(M)


def nystrom_apply(f: NystromFactors, rho, x: jax.Array) -> jax.Array:
    """P x = U diag(S) Uᵀ x + ρ x."""
    unsqueeze = x.ndim == 1
    x_in = x[:, None] if unsqueeze else x
    out = hmm(f.U, f.S[:, None] * hmm(f.U.T, x_in)) + rho * x_in
    return out[:, 0] if unsqueeze else out


def nystrom_apply_inv(
    f: NystromFactors,
    rho,
    x: jax.Array,
    L: Optional[jax.Array] = None,
) -> jax.Array:
    """P⁻¹ x.

    With ``L`` (low-precision path): (1/ρ)(x − U (LLᵀ)⁻¹ Uᵀ x).
    Without: Woodbury-style (1/ρ)(x − UUᵀx) + U (S+ρ)⁻¹ Uᵀ x.
    """
    unsqueeze = x.ndim == 1
    x_in = x[:, None] if unsqueeze else x
    UTx = hmm(f.U.T, x_in)
    if L is not None:
        y = solve_tri_lower(L, UTx)
        y = solve_tri_upper(L.T, y)
        out = (1.0 / rho) * (x_in - hmm(f.U, y))
    else:
        out = (1.0 / rho) * (x_in - hmm(f.U, UTx)) + hmm(
            f.U, UTx / (f.S + rho)[:, None]
        )
    return out[:, 0] if unsqueeze else out


# -- OO shell -----------------------------------------------------------------
class Nystrom(Preconditioner):
    """Randomized Nyström preconditioner.

    Attributes:
        U, S: Nyström eigen-factors.
        rho: effective damping (config.rho, or baseline + S[-1] after an
            adaptive ``_update_damping``).
    """

    def __init__(self, config: NystromConfig):
        super().__init__(config)
        self.U = None
        self.S = None
        self.rho = config.rho
        self.low_precision = False
        self.L = None

    def _update(self, A, *args, key=None, **kwargs):
        dtype = jnp.dtype(A.dtype)
        # In low precision the inverse takes the extra-Cholesky path.
        if dtype != jnp.dtype(jnp.float64):
            self.low_precision = True
        f = nystrom_update(
            as_matmat(A), A.shape[1], self.config.rank, self.config.sketch,
            _as_key(key), dtype,
        )
        self.U, self.S = f.U, f.S
        self.rho = self.config.rho
        self.L = None

    def _factors(self) -> NystromFactors:
        return NystromFactors(U=self.U, S=self.S)

    def _matmul(self, x):
        return nystrom_apply(self._factors(), self.rho, x)

    def _ensure_L(self):
        if self.low_precision and self.L is None:
            self.L = nystrom_inv_chol(self.U, self.S, self.rho)

    def _inverse_matmul_1d(self, x):
        self._ensure_L()
        return nystrom_apply_inv(self._factors(), self.rho, x, self.L)

    def _inverse_matmul_2d(self, x):
        self._ensure_L()
        return nystrom_apply_inv(self._factors(), self.rho, x, self.L)

    def _functional_inverse(self):
        self._ensure_L()
        if self.low_precision:

            def apply_inv(state, x):
                f, rho, L = state
                return nystrom_apply_inv(f, rho, x, L)

            return apply_inv, (self._factors(), self.rho, self.L)

        def apply_inv(state, x):
            f, rho = state
            return nystrom_apply_inv(f, rho, x, None)

        return apply_inv, (self._factors(), self.rho)

    def _update_damping(self, baseline_rho: float) -> None:
        """ρ ← baseline + S[-1] in adaptive mode; invalidates the inverse factor."""
        if self.config.damping_mode == _DampingMode.ADAPTIVE:
            self.rho = nystrom_damping(self.S, self.rho, baseline_rho, adaptive=True)
            self.L = None
