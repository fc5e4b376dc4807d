"""SAP — randomized block-coordinate solver ("ASkotch" for KRR), TPU-native.

Behavioral parity with the reference SAP (``rlaopt/solvers/sap.py:25-175``):
uniform block sampling without replacement, per-step block preconditioner
(Identity/Newton/Nyström) built from ``A_blk_oracle(blk)`` with baseline-reg
damping, stepsize 1/λ_max(P⁻¹(A_blk + reg·I)) via randomized powering (exact
Newton shortcut = 1.0), block gradient through ``A_row_oracle(blk)``, optional
Nesterov-type acceleration with (β, γ, α) from (μ, ν), per-column convergence
masking.

TPU re-design:

* The entire iteration — sampling, block-Nyström build, power iteration,
  gradient, scatter update — is one traced function; ``_run_chunk(n)`` runs n
  iterations in a single ``lax.scan`` with the PRNG key threaded through the
  carry. Fixed ``blk_sz`` keeps all shapes static.
* Column masking is full-width compute with ``jnp.where`` freezing converged
  columns (identical iterates; see pcg.py for the embedding argument).
* Block updates use ``W.at[blk].add(...)`` scatter — no dynamic shapes.

Note: the reference crashes (NameError) for a Newton block preconditioner
with rho ≠ reg (``sap.py:88-111`` leaves S undefined); here that case takes
the power-iteration path as intended.
"""

from functools import partial
from typing import NamedTuple, TYPE_CHECKING

import jax
import jax.numpy as jnp

from .configs import SAPAccelConfig
from .solver import Solver
from ..linops.base import LinOp
from ..preconditioners import (
    IdentityConfig,
    NewtonConfig,
    NystromConfig,
    PreconditionerConfig,
)
from ..preconditioners.enums import _DampingMode
from ..preconditioners.newton import newton_apply_inv, newton_update
from ..preconditioners.nystrom import (
    nystrom_apply_inv,
    nystrom_inv_chol,
    nystrom_update,
)
from ..spectral_estimators.spectral_norm import randomized_powering
from ..utils.checkers import _as_key
from ..utils.linalg import hmm

if TYPE_CHECKING:
    from ..models import LinSys


__all__ = ["SAP", "SAPState", "sap_accel_from_pilot"]


def sap_accel_from_pilot(
    rel_res: float, iters: int, n: int, blk_sz: int, safety: float = 0.9,
) -> SAPAccelConfig:
    """Accelerated-SAP (μ, ν) from a short PLAIN-SAP pilot run.

    The reference leaves (μ, ν) to the user — its own headline experiment
    picks μ·ν = 1, which makes the Nesterov recurrence exactly inert (see
    ``SAPAccelConfig``). The theory wants μ = strong convexity of the
    expected preconditioned iteration and ν ≈ n/blk_sz; neither the raw
    inverse condition number (orders too small — measured 1e4× slower than
    plain at n=4096) nor the Nyström S-floor ratio ``ρ/(S_min+ρ)``
    (~25× too aggressive on the same problem) predicts a usable μ. What
    does: plain SAP's own measured per-iteration contraction ``c`` IS a
    spectral measurement of the preconditioned sampled operator —
    ``1 − c ≈ (blk_sz/n)·λ_min(P̄⁻¹Ā)``, exactly the μ the accelerated
    recurrence wants. Grid-validated at n=4096/blk=n/8 (μ* plateau
    [0.01, 0.03] ∋ pilot estimate 0.0215; accel beats plain 5.5× in
    residual at equal iterations — benchmarks/SAP_ACCEL_r4.json).

    Args: ``rel_res`` — the pilot's final max relative residual;
    ``iters`` — pilot iteration count; ``safety`` caps μ at
    ``safety/ν`` (μ·ν < 1 is required for a live recurrence).
    """
    import math

    if not (0.0 < rel_res < 1.0):
        raise ValueError(
            f"pilot rel_res must be in (0, 1), got {rel_res} — run enough "
            "pilot iterations for measurable contraction"
        )
    nu = n / blk_sz
    c = math.exp(math.log(rel_res) / max(iters, 1))
    mu = min(1.0 - c, safety / nu)
    return SAPAccelConfig(mu=float(mu), nu=float(nu))

VALID_PRECONDS = [IdentityConfig, NewtonConfig, NystromConfig]


class SAPState(NamedTuple):
    W: jax.Array
    V: jax.Array  # momentum term (aliases W when accel=False)
    Y: jax.Array  # acceleration point (aliases W when accel=False)
    key: jax.Array
    t: jax.Array  # iteration counter (drives the debug block schedule)


class SAP(Solver):
    """SAP solver over a :class:`~rlaopt_tpu.models.LinSys` system."""

    def __init__(
        self,
        system: "LinSys",
        W_init: jax.Array,
        precond_config: PreconditionerConfig,
        blk_sz: int,
        accel: bool,
        accel_config: SAPAccelConfig,
        power_iters: int,
        key=None,
        _block_schedule=None,
        blk_dense=None,
        sampling="auto",
    ):
        self.system = system
        if type(precond_config) not in VALID_PRECONDS:
            raise TypeError(
                f"Valid preconditioner configs for SAP are {VALID_PRECONDS}, "
                f"but received {type(precond_config)}"
            )
        if system.A_row_oracle is None or system.A_blk_oracle is None:
            raise ValueError("SAP requires A_row_oracle and A_blk_oracle")
        self.precond_config = precond_config
        self.blk_sz = blk_sz
        self.accel = accel
        self.accel_config = accel_config
        self.power_iters = power_iters

        W0 = jnp.asarray(W_init)
        if W0.ndim == 1:
            W0 = W0[:, None]
        if self.accel:
            self.beta = 1 - (accel_config.mu / accel_config.nu) ** 0.5
            self.gamma = 1 / (accel_config.mu * accel_config.nu) ** 0.5
            self.alpha = 1 / (1 + self.gamma * accel_config.nu)
        # Debug/parity hook: a fixed (T, blk_sz) block schedule overriding
        # the random sampler (used by the reference-parity suite).
        self._block_schedule = (
            jnp.asarray(_block_schedule) if _block_schedule is not None else None
        )
        self._blk_dense_fn = self._resolve_blk_dense(blk_dense, W0.dtype)
        # Host-side block sampling: jax.random.choice(n, blk_sz,
        # replace=False) lowers to a full n-element sort EVERY iteration —
        # tens of ms of device time at n=1M. Pre-drawing each chunk's
        # blocks on the host (numpy, seeded from the solver key) gives the
        # identical iid uniform without-replacement distribution at zero
        # device cost; "auto" switches over where the sort starts to
        # matter. The debug `_block_schedule` override wins over both.
        n = system.A.shape[0]
        self._host_sampling = _block_schedule is None and (
            sampling == "host" or (sampling == "auto" and n >= (1 << 17))
        )
        self.state = SAPState(
            W=W0, V=W0, Y=W0, key=_as_key(key), t=jnp.asarray(0)
        )
        self._chunk_fn = self._build_chunk_fn()

    _BLK_DENSE_BUDGET = 512 << 20  # bytes: auto-materialization cap

    def _resolve_blk_dense(self, blk_dense, dtype):
        """Pick the per-step block-tile materializer (or None).

        The block operator is re-applied ~power_iters + sketch times per
        iteration; when the oracle can materialize K[blk, blk] directly
        (one kernel-tile evaluation), doing so once and reusing dense
        matmuls removes every recomputation. Auto (None) enables it when
        the oracle is a bound method of an object exposing ``blk_dense``
        and the tile fits the budget; True requires it; False disables.
        """
        if blk_dense is False:
            return None
        owner = getattr(self.system.A_blk_oracle, "__self__", None)
        fn = getattr(owner, "blk_dense", None)
        if fn is None:
            if blk_dense is True:
                raise ValueError(
                    "blk_dense=True requires the block oracle to expose a "
                    "dense materialization (e.g. a KernelLinOp.blk_oracle)"
                )
            return None
        tile_bytes = self.blk_sz * self.blk_sz * jnp.dtype(dtype).itemsize
        if blk_dense is None and tile_bytes > self._BLK_DENSE_BUDGET:
            return None
        return fn

    @property
    def W(self):
        return self.state.W

    # -- per-step pieces (traced) -------------------------------------------
    # The oracle pair used inside the trace is threaded explicitly through
    # `_step_fn` as (blk_mm, row_mm) callables; the multi-host chunk builds
    # them from a payload-rebound operator (see _build_chunk_fn) so no
    # instance attribute is ever mutated during tracing.

    def _default_blk_mm(self, blk, X):
        return self.system.A_blk_oracle(blk) @ X

    def _default_row_mm(self, blk, X):
        return self.system.A_row_oracle(blk) @ X

    def _get_precond(self, blk, key, dtype, blk_mm, K_blk=None):
        """Build the block preconditioner state; returns (apply_inv, exact)."""
        reg = self.system.reg
        cfg = self.precond_config
        if isinstance(cfg, IdentityConfig):
            return (lambda x: x), False
        if isinstance(cfg, NewtonConfig):
            A_blk = (
                K_blk if K_blk is not None
                else blk_mm(blk, jnp.eye(self.blk_sz, dtype=dtype))
            )
            L = newton_update(A_blk, cfg.rho)
            exact = cfg.rho == reg
            return (lambda x: newton_apply_inv(L, x)), exact
        # Nyström
        f = nystrom_update(
            lambda X: blk_mm(blk, X), self.blk_sz, cfg.rank, cfg.sketch,
            key, dtype,
        )
        if cfg.damping_mode == _DampingMode.ADAPTIVE:
            rho = reg + f.S[-1]
        else:
            rho = jnp.asarray(cfg.rho, dtype)
        low_precision = jnp.dtype(dtype) != jnp.dtype(jnp.float64)
        L = nystrom_inv_chol(f.U, f.S, rho) if low_precision else None
        return (lambda x: nystrom_apply_inv(f, rho, x, L)), False

    def _get_stepsize(self, blk, apply_inv, exact, key, dtype, blk_mm):
        if exact:
            return jnp.asarray(1.0, dtype)
        reg = jnp.asarray(self.system.reg, dtype)

        def mv(v):
            return apply_inv(blk_mm(blk, v) + reg * v)

        S_op = LinOp((self.blk_sz, self.blk_sz), matvec=mv, dtype=dtype)
        max_eig, _ = randomized_powering(
            S_op, max_iters=self.power_iters, key=key
        )
        return 1.0 / max_eig

    def _step_fn(
        self, state: SAPState, mask, blk_mm, row_mm, blk=None,
        blk_dense_fn=None, B=None,
    ) -> SAPState:
        dtype = state.W.dtype
        n = self.system.A.shape[0]
        reg = jnp.asarray(self.system.reg, dtype)
        if B is None:  # closure path: B baked into the program (small n)
            B = self.system.B
        # k_blk is burned even when blk arrives precomputed (host sampling)
        # so the k_prec/k_pow streams are mode-independent.
        key, k_blk, k_prec, k_pow = jax.random.split(state.key, 4)

        if blk is None:
            if self._block_schedule is not None:
                blk = self._block_schedule[
                    state.t % self._block_schedule.shape[0]
                ]
            else:
                blk = jax.random.choice(k_blk, n, (self.blk_sz,), replace=False)
        K_blk = None
        if blk_dense_fn is not None:
            # One tile evaluation; the sketch + every power iteration below
            # become dense matmuls on the resident block.
            K_blk = blk_dense_fn(blk)

            def blk_mm(b, Z, _K=K_blk):  # noqa: ARG005 — b fixed to blk
                # HIGHEST: without it the TPU default executes the f32
                # matmul as bf16 passes (~1e-3 relative), feeding the
                # Nyström sketch/Cholesky and power iteration with errors
                # far beyond the streamed oracle's tier — the opposite of
                # blk_dense's accuracy story.
                return hmm(_K, Z)

        apply_inv, exact = self._get_precond(
            blk, k_prec, dtype, blk_mm, K_blk=K_blk
        )
        stepsize = self._get_stepsize(
            blk, apply_inv, exact, k_pow, dtype, blk_mm
        )

        eval_pt = state.Y if self.accel else state.W
        grad = row_mm(blk, eval_pt) + reg * eval_pt[blk] - B[blk]
        direction = apply_inv(grad)

        # Robustness: a degenerate block (failed factorization, divergent
        # power iteration) yields a non-finite direction — skip the update
        # for affected columns instead of poisoning the iterate.
        dir_ok = jnp.all(jnp.isfinite(direction), axis=0) & jnp.isfinite(
            stepsize
        )
        mcol = (mask & dir_ok)[None, :]
        if self.accel:
            Wc = state.Y.at[blk].add(-stepsize * direction)
            W = jnp.where(mcol, Wc, state.W)
            Vc = (self.beta * state.V + (1 - self.beta) * state.Y).at[blk].add(
                -stepsize * self.gamma * direction
            )
            V = jnp.where(mcol, Vc, state.V)
            Yc = self.alpha * V + (1 - self.alpha) * W
            Y = jnp.where(mcol, Yc, state.Y)
            return SAPState(W=W, V=V, Y=Y, key=key, t=state.t + 1)
        Wc = state.W.at[blk].add(-stepsize * direction)
        W = jnp.where(mcol, Wc, state.W)
        return SAPState(W=W, V=W, Y=W, key=key, t=state.t + 1)

    def _build_chunk_fn(self):
        # Multi-host path: when the oracles are the bound methods of a
        # mesh-sharded operator, pass its payload as a jit ARGUMENT and
        # rebind inside the trace (closing over arrays spanning
        # non-addressable devices is illegal under jax.distributed; see
        # pcg.py). Pytree operators (KernelLinOp) whose oracles are their
        # own bound methods travel through jit as an operand pytree for the
        # same reason PCG's `_pass_A` path exists: closing over the payload
        # bakes it into the compiled program as a CONSTANT, and at n=10M
        # the 2.4 GB constant upload breaks the remote-compile tunnel
        # (measured: config 7 died with a broken pipe mid-compile). Custom
        # user oracle callables keep the closure path.
        from ..linops.sharded import ShardedLinOp

        from .pcg import _is_pytree_operand

        A = self.system.A
        bound_to_A = (
            getattr(self.system.A_row_oracle, "__self__", None) is A
            and getattr(self.system.A_blk_oracle, "__self__", None) is A
        )
        self._pass_data = isinstance(A, ShardedLinOp) and bound_to_A
        self._pass_A = (
            not self._pass_data and bound_to_A and _is_pytree_operand(A)
        )
        host = self._host_sampling
        use_bd = self._blk_dense_fn is not None
        if self._pass_data or self._pass_A:

            @partial(jax.jit, static_argnames=("n_steps",))
            def chunk(A_arg, B, state, mask, n_steps, blks=None):
                A_loc = A._with_data(A_arg) if self._pass_data else A_arg

                def blk_mm(blk, X):
                    return A_loc.blk_oracle(blk) @ X

                def row_mm(blk, X):
                    return A_loc.row_oracle(blk) @ X

                bd = getattr(A_loc, "blk_dense", None) if use_bd else None

                def body(s, blk):
                    return (
                        self._step_fn(
                            s, mask, blk_mm, row_mm, blk=blk,
                            blk_dense_fn=bd, B=B,
                        ),
                        None,
                    )

                state, _ = jax.lax.scan(
                    body, state, blks, length=None if host else n_steps
                )
                return state

            return chunk

        @partial(jax.jit, static_argnames=("n_steps",))
        def chunk(state, mask, n_steps, blks=None):
            def body(s, blk):
                return (
                    self._step_fn(
                        s, mask, self._default_blk_mm, self._default_row_mm,
                        blk=blk, blk_dense_fn=self._blk_dense_fn,
                    ),
                    None,
                )

            state, _ = jax.lax.scan(
                body, state, blks, length=None if host else n_steps
            )
            return state

        return chunk

    def _sample_host_blocks(self, n_steps: int):
        """(n_steps, blk_sz) iid uniform without-replacement block draws.

        Seeded deterministically from the solver key and the iteration
        counter, so a given (key, chunk boundary) pair reproduces across
        runs exactly like the in-trace sampler does.
        """
        import numpy as np

        n = self.system.A.shape[0]
        k = self.state.key
        if jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
            k = jax.random.key_data(k)
        kd = np.asarray(k, dtype=np.uint32).ravel()
        rng = np.random.default_rng(
            np.concatenate([kd, [np.uint32(int(self.state.t))]])
        )
        blks = np.empty((n_steps, self.blk_sz), dtype=np.int32)
        for i in range(n_steps):
            blks[i] = rng.choice(n, size=self.blk_sz, replace=False)
        return jnp.asarray(blks)

    def _step(self):
        self._run_chunk(1)

    def _run_chunk(self, n_steps: int):
        blks = (
            self._sample_host_blocks(n_steps) if self._host_sampling else None
        )
        if self._pass_data:
            self.state = self._chunk_fn(
                self.system.A._data, self.system.B, self.state,
                self.system.mask, n_steps, blks=blks,
            )
        elif self._pass_A:
            self.state = self._chunk_fn(
                self.system.A, self.system.B, self.state,
                self.system.mask, n_steps, blks=blks,
            )
        else:
            self.state = self._chunk_fn(
                self.state, self.system.mask, n_steps, blks=blks
            )
