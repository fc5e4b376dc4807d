"""Solver ABC (parity: ``rlaopt/solvers/solver.py:6-16``).

TPU execution model: besides the reference's per-iteration ``_step()``, every
solver implements ``_run_chunk(n_steps)`` — ``n_steps`` iterations compiled
into one ``lax.scan`` so the hot loop never touches the host. The model layer
drives chunks of ``callback_freq`` steps, which is exactly the reference's
semantics (the convergence mask only updates on logging iterations,
``rlaopt/models/model.py:104-110``).
"""

from abc import ABC, abstractmethod


__all__ = ["Solver"]


class Solver(ABC):
    def __init__(self, *args, **kwargs):
        pass

    @abstractmethod
    def _get_precond(self, *args, **kwargs):
        """Build the preconditioner for this solver."""

    @abstractmethod
    def _step(self, *args, **kwargs):
        """Advance one iteration (host-visible parity API)."""

    def _run_chunk(self, n_steps: int):
        """Advance ``n_steps`` iterations in one compiled chunk.

        Default: n_steps host-level ``_step`` calls; concrete solvers override
        with a ``lax.scan``.
        """
        for _ in range(n_steps):
            self._step()

    def residual(self):
        """The solver's carried (recurrence) residual, or None.

        Solvers that maintain the residual as part of their iteration state
        (PCG's R) expose it here so the model layer can log metrics without
        re-applying the operator — an O(n·k) norm instead of a full matvec
        at every logging boundary. Solvers without one (SAP's block updates
        never form a residual) return None and the model falls back to the
        full evaluation.
        """
        return None
