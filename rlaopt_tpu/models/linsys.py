"""LinSys model: solve (A + reg·I)W = B.

Parity: ``rlaopt/models/linsys.py:14-159`` — B auto-promoted to 2D, paired
row/blk oracles (both-or-neither), per-column absolute/relative residual
metrics, per-column convergence mask ``abs_res > max(rtol·‖B‖, atol)``,
``solve()`` wiring config → Logger → solver → train loop.

The residual metric computation is jitted; the mask lives host-side (it only
changes at logging boundaries and gates the compiled solver chunks).
"""

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .model import Model
from ..linops.base import LinOp
from ..linops.types import _is_linop_or_array
from ..solvers import _get_solver, _get_solver_name, _is_solver_config
from ..utils.checkers import _as_key, _is_array, _is_callable, _is_nonneg_float
from ..utils.linalg import hmm
from ..utils.logger import Logger


__all__ = ["LinSys"]


@partial(jax.jit, static_argnames=())
def _residuals(A_applied_W, B, reg, W):
    abs_res = jnp.linalg.norm(B - (A_applied_W + reg * W), axis=0)
    rel_res = abs_res / jnp.linalg.norm(B, axis=0)
    return abs_res, rel_res


class LinSys(Model):
    """Positive-definite linear system (A + reg·I)W = B."""

    def __init__(
        self,
        A,
        B: jax.Array,
        reg: float = 0.0,
        A_row_oracle: Optional[Callable] = None,
        A_blk_oracle: Optional[Callable] = None,
    ):
        """Initialize the LinSys model.

        Args:
            A: LinOp or dense matrix.
            B: right-hand side (n,) or (n, k).
            reg: nonnegative ridge regularization.
            A_row_oracle: ``blk → K[blk, :]`` operator (SAP); paired with
                A_blk_oracle (both or neither).
            A_blk_oracle: ``blk → K[blk, blk]`` operator (SAP).
        """
        self._check_inputs(A, B, reg, A_row_oracle, A_blk_oracle)
        self._A = A
        B = jnp.asarray(B)
        self._B = B[:, None] if B.ndim == 1 else B
        self._reg = reg
        self._A_row_oracle = A_row_oracle
        self._A_blk_oracle = A_blk_oracle
        self._mask = jnp.ones((self._B.shape[1],), dtype=bool)

    @property
    def A(self):
        return self._A

    @property
    def B(self):
        return self._B

    @property
    def reg(self):
        return self._reg

    @property
    def A_row_oracle(self):
        return self._A_row_oracle

    @property
    def A_blk_oracle(self):
        return self._A_blk_oracle

    @property
    def mask(self):
        return self._mask

    def _check_inputs(
        self, A: Any, B: Any, reg: Any, A_row_oracle: Any, A_blk_oracle: Any
    ):
        _is_linop_or_array(A, "A")
        _is_array(B, "B")
        _is_nonneg_float(reg, "reg")
        if A_row_oracle is not None:
            _is_callable(A_row_oracle, "A_row_oracle")
        if A_blk_oracle is not None:
            _is_callable(A_blk_oracle, "A_blk_oracle")
        if A_row_oracle is not None and A_blk_oracle is None:
            raise ValueError(
                "A_blk_oracle must be provided if A_row_oracle is provided"
            )
        if A_blk_oracle is not None and A_row_oracle is None:
            raise ValueError(
                "A_row_oracle must be provided if A_blk_oracle is provided"
            )

    def _apply_A(self, W):
        if isinstance(self._A, LinOp):
            return self._A @ W
        return hmm(jnp.asarray(self._A), W)

    def _compute_internal_metrics(self, W: jax.Array):
        abs_res, rel_res = _residuals(
            self._apply_A(W), self._B, jnp.asarray(self._reg, W.dtype), W
        )
        return {"abs_res": abs_res, "rel_res": rel_res}

    def _check_termination_criteria(
        self, internal_metrics: dict, atol: float, rtol: float
    ) -> bool:
        abs_res = internal_metrics["abs_res"]
        comp_tol = jnp.maximum(
            rtol * jnp.linalg.norm(self._B, axis=0), atol
        )
        self._mask = abs_res > comp_tol
        return bool(jnp.all(~self._mask))

    def solve(
        self,
        solver_config,
        W_init: jax.Array,
        callback_fn: Optional[Callable] = None,
        callback_args: list = [],
        callback_kwargs: dict = {},
        callback_freq: int = 10,
        log_in_wandb: bool = False,
        wandb_init_kwargs: Optional[dict] = None,
        key=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_freq: Optional[int] = None,
        resume: bool = False,
    ):
        """Solve the system; returns ``(solution, log)``.

        ``key`` seeds randomized components (preconditioner sketches, SAP
        block sampling); None draws from the package-global chain.
        ``checkpoint_dir``/``checkpoint_freq``/``resume`` enable solver-state
        checkpointing (every ``checkpoint_freq`` logging rounds).
        """
        _is_solver_config(solver_config, "solver_config")
        _is_array(W_init, "W_init")
        if log_in_wandb and wandb_init_kwargs is None:
            raise ValueError(
                "wandb_init_kwargs must be specified if log_in_wandb is True"
            )

        # Reset the convergence mask for a fresh solve.
        self._mask = jnp.ones((self._B.shape[1],), dtype=bool)

        atol, rtol = solver_config.atol, solver_config.rtol

        def termination_fn(internal_metrics):
            return self._check_termination_criteria(internal_metrics, atol, rtol)

        log_fn = self._get_log_fn(callback_fn, callback_args, callback_kwargs)
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
            key=_as_key(key),
        )

        checkpointer = None
        if checkpoint_dir is not None:
            from ..utils.checkpoint import SolveCheckpointer

            checkpointer = SolveCheckpointer(checkpoint_dir)

        solution, log = self._train(
            logger=logger,
            termination_fn=termination_fn,
            solver=solver,
            max_iters=solver_config.max_iters,
            checkpointer=checkpointer,
            checkpoint_freq=checkpoint_freq or 1,
            resume=resume,
        )
        return solution, log
