"""Block preconditioned conjugate gradient, TPU-native.

Behavioral parity with the reference PCG (``rlaopt/solvers/pcg.py:13-93``)
including per-column convergence masking, re-designed for XLA:

* **Static shapes.** The reference shrinks matrices to the unconverged columns
  (boolean fancy-indexing). Here every iteration computes full-width updates
  and *embeds* the masked sub-solves: with column mask m and M = P_ᵀAP_, the
  solve over the masked submatrix equals solving
  ``(M ⊙ mmᵀ + diag(1−m)) α = RZ ⊙ mmᵀ`` — the off-mask block is the
  identity, so α has zero rows/columns off-mask and the full-width update
  touches exactly the reference's entries, iterate-for-iterate.
* **Chunked execution.** ``_run_chunk(n)`` compiles n iterations into one
  ``lax.scan``; the mask is constant within a chunk, which matches the
  reference exactly (the mask only changes on logging iterations,
  ``rlaopt/models/model.py:104-110``).
* The preconditioner is built once from the full operator and threaded
  through the loop as a pytree (functional inverse).
"""

from functools import partial
from typing import NamedTuple, TYPE_CHECKING

import jax
import jax.numpy as jnp

from .solver import Solver
from ..preconditioners import PreconditionerConfig, _get_precond
from ..linops.base import LinOp
from ..utils.checkers import _as_key
from ..utils.linalg import hmm

if TYPE_CHECKING:
    from ..models import LinSys


__all__ = ["PCG", "PCGState", "pcg_init", "pcg_step"]


class PCGState(NamedTuple):
    W: jax.Array
    R: jax.Array
    Z: jax.Array
    P_: jax.Array
    RZ: jax.Array
    ok: jax.Array  # per-column health: False once CG breaks down (f32 floor)


def _op_mm(A, X):
    """A @ X for LinOp or dense operand (dense at highest precision)."""
    if isinstance(A, LinOp):
        return A @ X
    return hmm(A, X)


def _is_sharded_payload_operand(A) -> bool:
    """Mesh-sharded operator whose payload should travel as a jit argument."""
    from ..linops.sharded import ShardedLinOp

    return isinstance(A, ShardedLinOp)


def _is_zero(W) -> bool:
    """Host-side check that the init iterate is exactly zero (one cheap
    device reduction) — lets ``pcg_init`` skip the full operator apply."""
    return not bool(jax.device_get(jnp.any(W != 0)))


def _is_pytree_operand(A) -> bool:
    """True when A can travel through jit as an operand pytree."""
    import numpy as np

    from ..linops.sharded import ShardedLinOp

    if isinstance(A, ShardedLinOp):
        return False
    if isinstance(A, (jax.Array, np.ndarray)):
        return True
    if isinstance(A, LinOp):
        return jax.tree_util.all_leaves([A]) is False  # registered pytree
    return False


def pcg_init(A, B, reg, W, inv_fn, pstate, w_zero: bool = False) -> PCGState:
    """R = B − (A + reg·I)W;  Z = P⁻¹R;  P_ = Z;  RZ = RᵀZ.

    For f32 kernel operators the residual is evaluated compensated
    (``matmat_compensated``): residual-replacement restarts (``_resync``)
    then converge to the compensated floor, not the plain-f32 one.

    ``w_zero=True`` (static) asserts W == 0 so R = B exactly — the common
    zero-init case skips the full operator apply, which at n=1M is a ~30 s
    compensated sweep spent multiplying by zeros.
    """
    if w_zero:
        R = B
    elif B.dtype == jnp.float32 and hasattr(A, "matmat_compensated"):
        hi, lo = A.matmat_compensated(W)
        R = (B - reg * W - hi) - lo
    else:
        R = B - (_op_mm(A, W) + reg * W)
    Z = inv_fn(pstate, R)
    P_ = Z
    RZ = hmm(R.T, Z)
    ok = jnp.ones((W.shape[1],), dtype=bool)
    return PCGState(W=W, R=R, Z=Z, P_=P_, RZ=RZ, ok=ok)


def _masked_embed(M, m):
    """Embed the masked submatrix of M as a block-identity full matrix."""
    mm = jnp.outer(m, m)
    return M * mm + jnp.diag(1.0 - m)


def _safe_solve(M, B):
    """Solve M X = B with a relative-eps ridge on M.

    Near convergence the small k×k systems (P_ᵀAP_ and RᵀZ) become
    numerically singular in f32 — the reference's ``torch.linalg.solve``
    would error out there; the eps·max|diag| ridge keeps the solve finite
    while perturbing well-conditioned systems at rounding level.
    """
    k = M.shape[0]
    delta = jnp.finfo(M.dtype).eps * jnp.max(jnp.abs(jnp.diagonal(M)))
    return jnp.linalg.solve(M + delta * jnp.eye(k, dtype=M.dtype), B)


def pcg_step(A, reg, inv_fn, pstate, state: PCGState, mask) -> PCGState:
    """One masked PCG iteration (full-width, mask-frozen columns).

    Columns are active when unconverged (``mask``) AND healthy (``state.ok``).
    A column turns unhealthy — permanently frozen — when its RᵀZ diagonal
    stops being positive-finite: the standard CG breakdown signal, reached at
    the dtype's accuracy floor. (The reference has no guard; its small solves
    error out or pollute every column at that point.)
    """
    dtype = state.W.dtype
    active = jnp.logical_and(mask, state.ok)
    m = active.astype(dtype)
    mm = jnp.outer(m, m)

    AP = _op_mm(A, state.P_) + reg * state.P_
    M = _masked_embed(hmm(state.P_.T, AP), m)
    RZ_masked = state.RZ * mm
    alpha = _safe_solve(M, RZ_masked)  # zero rows/cols off-mask

    W = state.W + hmm(state.P_, alpha) * m[None, :]
    R = state.R - hmm(AP, alpha) * m[None, :]

    Z_new = inv_fn(pstate, R)
    Z = jnp.where(active[None, :], Z_new, state.Z)

    RZ_new = hmm(R.T, Z_new) * mm
    beta = _safe_solve(_masked_embed(state.RZ, m), RZ_new)
    P_ = jnp.where(active[None, :], Z_new + hmm(state.P_, beta), state.P_)

    # Per-column health check on the *candidate* state.
    col_finite = (
        jnp.all(jnp.isfinite(W), axis=0)
        & jnp.all(jnp.isfinite(R), axis=0)
        & jnp.all(jnp.isfinite(P_), axis=0)
        & jnp.all(jnp.isfinite(RZ_new), axis=0)
    )
    col_pd = jnp.diagonal(RZ_new) > 0
    healthy = jnp.where(active, col_finite & col_pd, state.ok)

    # Freeze columns that just went unhealthy: keep the previous state there.
    keep = jnp.logical_or(~active, healthy)[None, :]
    W = jnp.where(keep, W, state.W)
    R = jnp.where(keep, R, state.R)
    Z = jnp.where(keep, Z, state.Z)
    P_ = jnp.where(keep, P_, state.P_)
    hh = jnp.outer(healthy, healthy)
    RZ_out = jnp.where(hh, RZ_new, 0.0)

    return PCGState(W=W, R=R, Z=Z, P_=P_, RZ=RZ_out, ok=healthy)


class PCG(Solver):
    """PCG solver over a :class:`~rlaopt_tpu.models.LinSys` system.

    The chunk function closes over the operator (sharded operators carry a
    Mesh and are not jit operands); its payload arrays become jit constants.
    """

    def __init__(
        self,
        system: "LinSys",
        W_init: jax.Array,
        precond_config: PreconditionerConfig,
        key=None,
        preconditioner=None,
    ):
        self.system = system
        self.precond_config = precond_config
        self._key = _as_key(key)
        # A prebuilt preconditioner (same operator/reg) skips the sketch +
        # factorization — refinement rounds reuse the base solve's factor.
        self.P = (
            preconditioner if preconditioner is not None
            else self._get_precond()
        )
        self._inv_fn, self._pstate = self.P._functional_inverse()
        self._reg = jnp.asarray(system.reg, dtype=W_init.dtype)
        W0 = jnp.asarray(W_init)
        if W0.ndim == 1:
            W0 = W0[:, None]
        A, inv_fn = system.A, self._inv_fn

        # Pytree-able operators (dense arrays, registered LinOp pytrees) are
        # passed as jit ARGUMENTS: closing over them embeds their bytes in
        # the compiled program (a 400MB dense A blows the remote-compile
        # upload limit). Sharded operators (not pytrees; carry a Mesh) are
        # closed over — their payloads are already placed.
        self._pass_A = _is_pytree_operand(A)
        self._pass_data = not self._pass_A and _is_sharded_payload_operand(A)

        if self._pass_A:

            @partial(jax.jit, static_argnames=("n_steps",))
            def chunk(A_arg, reg, pstate, state, mask, n_steps):
                def body(s, _):
                    return pcg_step(A_arg, reg, inv_fn, pstate, s, mask), None

                state, _ = jax.lax.scan(body, state, None, length=n_steps)
                return state

            init = jax.jit(
                lambda A_arg, B, reg, W, pstate, w_zero: pcg_init(
                    A_arg, B, reg, W, inv_fn, pstate, w_zero=w_zero
                ),
                static_argnames=("w_zero",),
            )
            # A as argument (not a closure constant) — see chunk note above.
            self._init_fn = lambda B, reg, W, pstate, w_zero=False: init(
                self.system.A, B, reg, W, pstate, w_zero=w_zero
            )
            self.state = self._init_fn(
                system.B, self._reg, W0, self._pstate, w_zero=_is_zero(W0)
            )
        elif _is_sharded_payload_operand(A):
            # Sharded operators carry a Mesh (not jit operands) but their
            # payload arrays may span non-addressable devices under
            # jax.distributed — closing over those is illegal. Pass the
            # payload as an argument and rebind inside the trace.
            @partial(jax.jit, static_argnames=("n_steps",))
            def chunk(A_data, reg, pstate, state, mask, n_steps):
                A_loc = A._with_data(A_data)

                def body(s, _):
                    return pcg_step(A_loc, reg, inv_fn, pstate, s, mask), None

                state, _ = jax.lax.scan(body, state, None, length=n_steps)
                return state

            init = jax.jit(
                lambda A_data, B, reg, W, pstate, w_zero: pcg_init(
                    A._with_data(A_data), B, reg, W, inv_fn, pstate,
                    w_zero=w_zero,
                ),
                static_argnames=("w_zero",),
            )
            self._init_fn = lambda B, reg, W, pstate, w_zero=False: init(
                A._data, B, reg, W, pstate, w_zero=w_zero
            )
            self.state = self._init_fn(
                system.B, self._reg, W0, self._pstate, w_zero=_is_zero(W0)
            )
        else:

            @partial(jax.jit, static_argnames=("n_steps",))
            def chunk(reg, pstate, state, mask, n_steps):
                def body(s, _):
                    return pcg_step(A, reg, inv_fn, pstate, s, mask), None

                state, _ = jax.lax.scan(body, state, None, length=n_steps)
                return state

            init = jax.jit(
                lambda B, reg, W, pstate, w_zero=False: pcg_init(
                    A, B, reg, W, inv_fn, pstate, w_zero=w_zero
                ),
                static_argnames=("w_zero",),
            )
            self._init_fn = init
            self.state = init(
                system.B, self._reg, W0, self._pstate, w_zero=_is_zero(W0)
            )

        self._chunk_fn = chunk

    @property
    def W(self):
        return self.state.W

    def residual(self):
        """Carried recurrence residual R (see ``Solver.residual``).

        Kept honest by ``_resync`` residual replacement; near the dtype
        floor it can drift optimistic, which is why the model layer
        CONFIRMS any recurrence-based termination decision with a full
        residual evaluation before declaring convergence.
        """
        return self.state.R

    def _get_precond(self):
        P = _get_precond(self.precond_config)
        P._update(self.system.A, key=self._key)
        P._update_damping(baseline_rho=self.system.reg)
        return P

    def _step(self):
        self._run_chunk(1)

    def _resync(self):
        """Restart from the current iterate with a freshly computed residual.

        Van-der-Vorst-style residual replacement: the recurred residual
        drifts from the true residual at the dtype's accuracy floor; a
        restart (R = B − (A+reg)W, fresh direction) is one extra operator
        apply and turns per-column CG breakdown into iterative refinement —
        pushing the attainable residual from the recurrence floor down to
        the residual-evaluation floor.
        """
        self.state = self._init_fn(
            self.system.B, self._reg, self.state.W, self._pstate
        )

    def _run_chunk(self, n_steps: int):
        if self._pass_A:
            self.state = self._chunk_fn(
                self.system.A,
                self._reg,
                self._pstate,
                self.state,
                self.system.mask,
                n_steps=n_steps,
            )
        elif self._pass_data:
            self.state = self._chunk_fn(
                self.system.A._data,
                self._reg,
                self._pstate,
                self.state,
                self.system.mask,
                n_steps=n_steps,
            )
        else:
            self.state = self._chunk_fn(
                self._reg,
                self._pstate,
                self.state,
                self.system.mask,
                n_steps=n_steps,
            )
        # Breakdown in any active column → restart with a true residual.
        if not bool(jnp.all(self.state.ok | ~self.system.mask)):
            self._resync()
