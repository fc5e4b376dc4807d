"""Preconditioned LSQR for (damped) least squares — TPU addition.

No reference analog (the reference only ships PCG/SAP for square SPD
systems); this implements BASELINE config #2, sketch-and-precondition least
squares: pair with :class:`~rlaopt_tpu.preconditioners.SkPre`, whose
Cholesky factor L (G = ΩA → L Lᵀ = (ΩA)ᵀ(ΩA) + ρI) right-preconditions the
operator as Â = A L⁻ᵀ, giving Â near-orthonormal columns and
condition-number-free convergence (Rokhlin–Tygert / Blendenpik scheme).

Implementation: Paige–Saunders LSQR with damping rotations, vectorized over
RHS columns, compiled in ``lax.scan`` chunks with per-column convergence
masking (same execution model as PCG/SAP here).
"""

from functools import partial
from typing import NamedTuple, TYPE_CHECKING

import jax
import jax.numpy as jnp

from .solver import Solver
from ..linops.base import LinOp
from ..preconditioners import (
    IdentityConfig,
    PreconditionerConfig,
    SkPreConfig,
    _get_precond,
)
from ..utils.checkers import _as_key
from ..utils.linalg import hmm, solve_tri_lower, solve_tri_upper

if TYPE_CHECKING:
    from ..models import LstSq


__all__ = ["LSQR", "LSQRState"]

VALID_PRECONDS = (IdentityConfig, SkPreConfig)


class LSQRState(NamedTuple):
    Y: jax.Array  # solution in preconditioned space (n, k)
    U: jax.Array  # (m, k)
    V: jax.Array  # (n, k)
    W: jax.Array  # (n, k) direction
    alpha: jax.Array  # (k,)
    phibar: jax.Array  # (k,)
    rhobar: jax.Array  # (k,)


def _colnorm(X):
    return jnp.sqrt(jnp.sum(X * X, axis=0))


def _safe_div(num, den):
    return num / jnp.where(den == 0, 1.0, den)


class LSQR(Solver):
    """LSQR over a :class:`~rlaopt_tpu.models.LstSq` problem."""

    def __init__(
        self,
        system: "LstSq",
        W_init: jax.Array,
        precond_config: PreconditionerConfig,
        damp: float = 0.0,
        key=None,
        preconditioner=None,
    ):
        if not isinstance(precond_config, VALID_PRECONDS):
            raise TypeError(
                f"Valid preconditioner configs for LSQR are {VALID_PRECONDS}, "
                f"but received {type(precond_config)}"
            )
        self.system = system
        self.damp = damp
        self._key = _as_key(key)
        self.precond_config = precond_config
        self.P = (
            preconditioner if preconditioner is not None
            else self._get_precond()
        )
        self._L = getattr(self.P, "L", None)  # None for Identity

        # LSQR starts its bidiagonalization from W=0 (a nonzero W_init would
        # require shifting the RHS; not supported, as in scipy's lsqr).
        self.state = self._init_state()
        self._chunk_fn = self._build_chunk_fn()

    # preconditioned operator: Â v = A L⁻ᵀ v;  Âᵀ u = L⁻¹ Aᵀ u
    # (A and L are threaded as explicit arguments so jit never embeds a
    # large dense operand as a program constant.)
    def _amv(self, A, L, V):
        if L is not None:
            V = solve_tri_upper(L.T, V)
        return A @ V if isinstance(A, LinOp) else hmm(A, V)

    def _armv(self, A, L, U):
        out = A.__rmatmul__(U.T).T if isinstance(A, LinOp) else hmm(A.T, U)
        if L is not None:
            out = solve_tri_lower(L, out)
        return out

    def _back_transform(self, Y):
        if self._L is not None:
            return solve_tri_upper(self._L.T, Y)
        return Y

    @property
    def W(self):
        return self._back_transform(self.state.Y)

    def _get_precond(self):
        P = _get_precond(self.precond_config)
        P._update(self.system.A, key=self._key)
        return P

    def _init_state(self) -> LSQRState:
        def init(A, L, B):
            beta = _colnorm(B)
            U = _safe_div(B, beta[None, :])
            V_raw = self._armv(A, L, U)
            alpha = _colnorm(V_raw)
            V = _safe_div(V_raw, alpha[None, :])
            return LSQRState(
                Y=jnp.zeros((V.shape[0], B.shape[1]), dtype=B.dtype),
                U=U,
                V=V,
                W=V,
                alpha=alpha,
                phibar=beta,
                rhobar=alpha,
            )

        return jax.jit(init)(self.system.A, self._L, self.system.B)

    def _step_fn(self, A, L, s: LSQRState, mask) -> LSQRState:
        dtype = s.Y.dtype
        m = mask.astype(dtype)[None, :]
        damp = jnp.asarray(self.damp, dtype)

        # bidiagonalization
        U_raw = self._amv(A, L, s.V) - s.alpha[None, :] * s.U
        beta = _colnorm(U_raw)
        U = _safe_div(U_raw, beta[None, :])
        V_raw = self._armv(A, L, U) - beta[None, :] * s.V
        alpha = _colnorm(V_raw)
        V = _safe_div(V_raw, alpha[None, :])

        # damping rotation
        rhobar1 = jnp.sqrt(s.rhobar**2 + damp**2)
        c1 = _safe_div(s.rhobar, rhobar1)
        phibar = c1 * s.phibar

        # main rotation
        rho = jnp.sqrt(rhobar1**2 + beta**2)
        c = _safe_div(rhobar1, rho)
        sn = _safe_div(beta, rho)
        theta = sn * alpha
        rhobar = -c * alpha
        phi = c * phibar
        phibar = sn * phibar

        Y = s.Y + _safe_div(phi, rho)[None, :] * s.W * m
        Wd = V - _safe_div(theta, rho)[None, :] * s.W

        keep = mask[None, :]
        return LSQRState(
            Y=jnp.where(keep, Y, s.Y),
            U=jnp.where(keep, U, s.U),
            V=jnp.where(keep, V, s.V),
            W=jnp.where(keep, Wd, s.W),
            alpha=jnp.where(mask, alpha, s.alpha),
            phibar=jnp.where(mask, phibar, s.phibar),
            rhobar=jnp.where(mask, rhobar, s.rhobar),
        )

    def _build_chunk_fn(self):
        @partial(jax.jit, static_argnames=("n_steps",))
        def chunk(A, L, state, mask, n_steps):
            def body(st, _):
                return self._step_fn(A, L, st, mask), None

            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        return chunk

    def _step(self):
        self._run_chunk(1)

    def _run_chunk(self, n_steps: int):
        self.state = self._chunk_fn(
            self.system.A, self._L, self.state, self.system.mask, n_steps
        )
