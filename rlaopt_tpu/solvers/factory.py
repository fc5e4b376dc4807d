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
    model: "Model", W_init: jax.Array, solver_config: SolverConfig, key=None
):
    """Instantiate the solver matching the config class."""
    cls = solver_config.__class__
    if cls is PCGConfig:
        return PCG(
            system=model,
            W_init=W_init,
            precond_config=solver_config.precond_config,
            key=key,
        )
    if cls is SAPConfig:
        return SAP(
            system=model,
            W_init=W_init,
            precond_config=solver_config.precond_config,
            blk_sz=solver_config.blk_sz,
            accel=solver_config.accel,
            accel_config=solver_config.accel_config,
            power_iters=solver_config.power_iters,
            key=key,
        )
    if cls is LSQRConfig:
        from .lsqr import LSQR

        return LSQR(
            system=model,
            W_init=W_init,
            precond_config=solver_config.precond_config,
            damp=solver_config.damp,
            key=key,
        )
    raise ValueError(f"No solver registered for config {cls.__name__}")
