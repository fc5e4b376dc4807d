"""Scaling mixin (reference-compat shim).

In this package scalar scaling is native to the operator (``scale`` payload,
``__mul__``, nested scales merge — see :mod:`rlaopt_tpu.linops.base`). This
mixin exists for API familiarity when porting code written against the
reference's ``ScaleMixin`` / ``_ScaledFunction``
(``rlaopt/linops/mixins.py:8-72``): same method names and composition
semantics, targeting jnp values/callables.
"""

from typing import Callable


__all__ = ["ScaleMixin", "_ScaledFunction"]


class _ScaledFunction:
    """Callable wrapper multiplying its result by a scale; scales merge."""

    def __init__(self, fn: Callable, scale: float):
        self.fn = fn
        self.scale = scale
        if hasattr(fn, "__name__"):
            self.__name__ = f"scaled_{fn.__name__}"

    def __call__(self, *args, **kwargs):
        return self.scale * self.fn(*args, **kwargs)


class ScaleMixin:
    """Adds ``_initialize_scaling`` / ``_apply_scaling`` helpers."""

    def _initialize_scaling(self, scale) -> None:
        self._scaling = float(scale) if scale is not None else 1.0

    def _apply_scaling(self, obj):
        """Scale a callable (returns a scaled callable) or a value."""
        if not hasattr(self, "_scaling") or self._scaling == 1.0:
            return obj
        if callable(obj):
            if isinstance(obj, _ScaledFunction):
                return _ScaledFunction(obj.fn, self._scaling * obj.scale)
            return _ScaledFunction(obj, self._scaling)
        return self._scaling * obj
