"""LstSq model: min ‖AW − B‖² (+ damp²‖W‖²) — TPU addition.

No reference analog (the reference's only model is the SPD LinSys); this is
the front-end for the sketch-and-precondition LSQR path (BASELINE config #2).
Follows the same Model contract: per-column metrics, convergence mask,
chunked training loop.

Termination metric: the normal-equation residual ‖Aᵀ(B − AW) − damp²W‖ per
column (→ 0 at the least-squares solution), relative to ‖AᵀB‖.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .model import Model
from ..linops.base import LinOp
from ..linops.types import _is_linop_or_array
from ..solvers import _get_solver, _get_solver_name, _is_solver_config
from ..utils.checkers import _as_key, _is_array, _is_nonneg_float
from ..utils.linalg import hmm
from ..utils.logger import Logger


__all__ = ["LstSq"]


class LstSq(Model):
    """Overdetermined least-squares problem min ‖AW − B‖² + damp²‖W‖²."""

    def __init__(self, A, B: jax.Array, damp: float = 0.0):
        self._check_inputs(A, B, damp)
        from .model import _wrap_sparse

        self._A = _wrap_sparse(A)
        B = jnp.asarray(B)
        self._B = B[:, None] if B.ndim == 1 else B
        self._damp = damp
        self._mask = jnp.ones((self._B.shape[1],), dtype=bool)
        self._atb_norm = None

    @property
    def A(self):
        return self._A

    @property
    def B(self):
        return self._B

    @property
    def damp(self):
        return self._damp

    @property
    def mask(self):
        return self._mask

    def _check_inputs(self, A: Any, B: Any, damp: Any):
        _is_linop_or_array(A, "A")
        _is_array(B, "B")
        _is_nonneg_float(damp, "damp")

    def _apply_A(self, W):
        return self._A @ W if isinstance(self._A, LinOp) else hmm(self._A, W)

    def _apply_AT(self, R):
        if isinstance(self._A, LinOp):
            return self._A.__rmatmul__(R.T).T
        return hmm(self._A.T, R)

    def _normal_residual(self, W):
        R = self._B - self._apply_A(W)
        G = self._apply_AT(R) - (self._damp**2) * W
        return jnp.linalg.norm(G, axis=0)

    def _compute_internal_metrics(self, W: jax.Array, force_true: bool = False):
        # force_true accepted for Model-layer signature compatibility; LstSq
        # metrics are always computed from a full operator apply.
        if self._atb_norm is None:
            self._atb_norm = jnp.linalg.norm(self._apply_AT(self._B), axis=0)
        abs_res = self._normal_residual(W)
        rel_res = abs_res / self._atb_norm
        return {"abs_res": abs_res, "rel_res": rel_res}

    def _check_termination_criteria(
        self, internal_metrics: dict, atol: float, rtol: float
    ) -> bool:
        if self._atb_norm is None:
            self._atb_norm = jnp.linalg.norm(self._apply_AT(self._B), axis=0)
        abs_res = internal_metrics["abs_res"]
        comp_tol = jnp.maximum(rtol * self._atb_norm, atol)
        self._mask = abs_res > comp_tol
        return bool(jnp.all(~self._mask))

    def solve(
        self,
        solver_config,
        W_init: jax.Array,
        callback_fn: Optional[Callable] = None,
        callback_args: Optional[list] = None,
        callback_kwargs: Optional[dict] = None,
        callback_freq: int = 10,
        log_in_wandb: bool = False,
        wandb_init_kwargs: Optional[dict] = None,
        key=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_freq: Optional[int] = None,
        resume: bool = False,
        preconditioner=None,
    ):
        """Solve; returns ``(solution, log)``.

        ``preconditioner`` optionally supplies an already-built
        preconditioner (e.g. a factored SkPre) so the solver skips its own
        sketch + factorization.
        """
        _is_solver_config(solver_config, "solver_config")
        _is_array(W_init, "W_init")
        if log_in_wandb and wandb_init_kwargs is None:
            raise ValueError(
                "wandb_init_kwargs must be specified if log_in_wandb is True"
            )
        self._mask = jnp.ones((self._B.shape[1],), dtype=bool)

        atol, rtol = solver_config.atol, solver_config.rtol

        def termination_fn(internal_metrics):
            return self._check_termination_criteria(internal_metrics, atol, rtol)

        log_fn = self._get_log_fn(
            callback_fn, callback_args or [], callback_kwargs or {}
        )
        wandb_kwargs = self._get_wandb_kwargs(
            log_in_wandb=log_in_wandb,
            wandb_init_kwargs=wandb_init_kwargs,
            solver_name=_get_solver_name(solver_config),
            solver_config=solver_config,
            callback_freq=callback_freq,
        )
        logger = Logger(
            log_freq=callback_freq, log_fn=log_fn, wandb_kwargs=wandb_kwargs
        )
        solver = _get_solver(
            model=self, W_init=W_init, solver_config=solver_config,
            key=_as_key(key), preconditioner=preconditioner,
        )
        checkpointer = None
        if checkpoint_dir is not None:
            from ..utils.checkpoint import SolveCheckpointer

            checkpointer = SolveCheckpointer(checkpoint_dir)
        return self._train(
            logger=logger,
            termination_fn=termination_fn,
            solver=solver,
            max_iters=solver_config.max_iters,
            checkpointer=checkpointer,
            checkpoint_freq=checkpoint_freq or 1,
            resume=resume,
        )
