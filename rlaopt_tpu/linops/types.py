"""Type helpers for linear operators (parity: ``rlaopt/linops/types.py:22-38``)."""

from typing import Any, Union

import jax
import numpy as np

from .base import LinOp, TwoSidedLinOp, SymmetricLinOp


__all__ = ["LinOpType", "_is_linop_or_array", "is_linop"]


LinOpType = Union[LinOp, TwoSidedLinOp, SymmetricLinOp]


def is_linop(obj: Any) -> bool:
    return isinstance(obj, LinOp)


def _is_linop_or_array(param: Any, param_name: str):
    if isinstance(param, (LinOp, jax.Array, np.ndarray)):
        return
    from ..sparse.sparse_tensor import _SparseTensor

    if isinstance(param, _SparseTensor):
        return
    raise TypeError(
        f"{param_name} is of type {type(param).__name__}, "
        "but expected type LinOpType, jax.Array, or a sparse tensor"
    )
