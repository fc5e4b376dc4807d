"""Solver factory (parity: ``rlaopt/solvers/factory.py:38-45``)."""

from typing import TYPE_CHECKING

import jax

from .configs import LSQRConfig, PCGConfig, SAPConfig, SolverConfig
from .pcg import PCG
from .sap import SAP

if TYPE_CHECKING:
    from ..models import LinSys, Model


__all__ = ["_get_solver"]


def _get_solver(
    model: "Model",
    W_init: jax.Array,
    solver_config: SolverConfig,
    key=None,
    preconditioner=None,
):
    """Instantiate the solver matching the config class.

    ``preconditioner`` (optional): an already-built
    :class:`~rlaopt_tpu.preconditioners.Preconditioner` for the SAME
    operator/regularization; the solver skips its own factorization. Used
    by mixed-precision refinement to share one factor across the base and
    correction solves, and available to callers with a prebuilt factor.
    SAP builds per-block preconditioners each iteration and cannot accept
    one.
    """
    cls = solver_config.__class__
    if cls is PCGConfig:
        return PCG(
            system=model,
            W_init=W_init,
            precond_config=solver_config.precond_config,
            key=key,
            preconditioner=preconditioner,
        )
    if cls is SAPConfig:
        if preconditioner is not None:
            raise ValueError(
                "SAP factors a fresh per-block preconditioner every "
                "iteration; a prebuilt preconditioner cannot be supplied"
            )
        return SAP(
            system=model,
            W_init=W_init,
            precond_config=solver_config.precond_config,
            blk_sz=solver_config.blk_sz,
            accel=solver_config.accel,
            accel_config=solver_config.accel_config,
            power_iters=solver_config.power_iters,
            key=key,
            blk_dense=solver_config.blk_dense,
            sampling=solver_config.sampling,
        )
    if cls is LSQRConfig:
        from .lsqr import LSQR

        return LSQR(
            system=model,
            W_init=W_init,
            precond_config=solver_config.precond_config,
            damp=solver_config.damp,
            key=key,
            preconditioner=preconditioner,
        )
    raise ValueError(f"No solver registered for config {cls.__name__}")
