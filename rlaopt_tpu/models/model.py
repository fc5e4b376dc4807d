"""Model ABC — solve-loop orchestration.

Parity: ``rlaopt/models/model.py:14-128``. The training loop keeps the
reference's observable semantics — metrics, callback merging, wandb config
population, termination checked only on logging iterations — but drives the
solver in compiled chunks of ``callback_freq`` iterations instead of
host-stepping every iteration. Because the reference's convergence mask also
only updates on logging iterations, the chunked execution is
iterate-for-iterate equivalent, while the hot loop never leaves the device.
"""

from abc import ABC, abstractmethod
from typing import Callable, Optional
from warnings import warn

from ..solvers import Solver, SolverConfig
from ..utils.logger import Logger


__all__ = ["Model"]


def _wrap_sparse(A):
    """Auto-wrap sparse tensors as matrix-free operators.

    Gives models the reference's usage surface — sparse data matrices fed
    directly into solve loops (``rlaopt/sparse/sparse_tensor.py:114-126``) —
    by adapting them through :func:`rlaopt_tpu.sparse.linop.sparse_aslinop`.
    """
    from ..sparse.sparse_tensor import _SparseTensor

    if isinstance(A, _SparseTensor):
        from ..linops.base import aslinop

        return aslinop(A)
    return A


class Model(ABC):
    def __init__(self, *args, **kwargs):
        pass

    @abstractmethod
    def _check_inputs(self, *args, **kwargs):
        pass

    @abstractmethod
    def _compute_internal_metrics(self, *args, **kwargs):
        pass

    @abstractmethod
    def _check_termination_criteria(self, *args, **kwargs):
        pass

    def _get_log_fn(
        self,
        callback_fn: Optional[Callable],
        callback_args: list,
        callback_kwargs: dict,
    ):
        if callback_fn is not None:

            def log_fn(w):
                callback_log = callback_fn(w, self, *callback_args, **callback_kwargs)
                internal_metrics_log = self._compute_internal_metrics(w)
                return {
                    "callback": callback_log,
                    "internal_metrics": internal_metrics_log,
                }

        else:

            def log_fn(w):
                return {"internal_metrics": self._compute_internal_metrics(w)}

        return log_fn

    def _get_wandb_kwargs(
        self,
        log_in_wandb: bool,
        wandb_init_kwargs: Optional[dict],
        solver_name: str,
        solver_config: SolverConfig,
        callback_freq: int,
    ):
        if not log_in_wandb:
            return None
        wandb_kwargs = {
            "config": {
                "solver_name": solver_name,
                "solver_config": solver_config.to_dict(),
                "callback_freq": callback_freq,
            },
        }
        for key, value in (wandb_init_kwargs or {}).items():
            if key == "config":
                warn(
                    "wandb_init_kwargs carries its own 'config' dict; its "
                    "entries are folded into the auto-populated solver "
                    "config (user values win on key collisions)."
                )
                wandb_kwargs["config"].update(value)
            else:
                wandb_kwargs[key] = value
        return wandb_kwargs

    def _train(
        self,
        logger: Logger,
        termination_fn: Callable,
        solver: Solver,
        max_iters: int,
        checkpointer=None,
        checkpoint_freq: Optional[int] = None,
        resume: bool = False,
    ):
        """Run the solve loop in chunks of ``logger.log_freq`` iterations.

        Checkpoint/resume (TPU addition; the reference has none): with a
        ``checkpointer``, (solver state, mask) is saved every
        ``checkpoint_freq`` logging rounds; ``resume=True`` restores the
        latest checkpoint and continues from its iteration. The log history
        and cumulative wall-clock are saved alongside (JSON sidecar), so a
        resumed solve's returned ``log`` covers the whole run and ``cum_time``
        keeps accumulating instead of restarting from zero.
        """
        log = {}

        i = 0
        if checkpointer is not None and resume:
            payload, step = checkpointer.restore(
                like={"state": solver.state, "mask": self._mask}
            )
            solver.state = payload["state"]
            self._mask = payload["mask"]
            i = step
            aux = checkpointer.restore_aux(step)
            if aux is not None:
                log.update({int(k): v for k, v in aux.get("log", {}).items()})
                logger.cum_time = float(aux.get("cum_time", 0.0))

        log[i] = logger._compute_log(0, solver.W)
        if termination_fn(log[i]["metrics"]["internal_metrics"]):
            return solver.W, log

        rounds = 0
        while i < max_iters:
            n_steps = min(logger.log_freq, max_iters - i)
            solver._run_chunk(n_steps)
            i += n_steps
            rounds += 1
            # force: the last chunk may be partial (max_iters not a multiple
            # of log_freq) — the final iterate must still be logged,
            # termination-checked, and eligible for the true-residual
            # replacement below.
            log_i = logger._compute_log(i, solver.W, force=(i >= max_iters))
            if log_i is not None:
                log[i] = log_i
                converged = termination_fn(log_i["metrics"]["internal_metrics"])
                if checkpointer is not None and checkpoint_freq and (
                    rounds % checkpoint_freq == 0 or converged
                ):
                    checkpointer.save(
                        i,
                        {"state": solver.state, "mask": self._mask},
                        aux={"log": log, "cum_time": logger.cum_time},
                    )
                if converged:
                    break

        logger._terminate()
        # If the last boundary's metrics came from the solver's recurrence
        # residual (metrics="recurrence"/"auto" on a large problem), replace
        # them with a full true-residual evaluation: the returned log's
        # final numbers are always backed by an operator apply, never by
        # the (potentially drift-optimistic) recurrence.
        final = log.get(i)
        if (
            final is not None
            and final["metrics"]["internal_metrics"].get("source")
            is not None
        ):
            final["metrics"]["internal_metrics"] = (
                self._compute_internal_metrics(solver.W, force_true=True)
            )
        return solver.W, log

    @abstractmethod
    def solve(self, *args, **kwargs):
        pass
