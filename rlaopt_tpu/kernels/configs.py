"""Kernel configuration (parity: ``rlaopt/kernels/configs.py:11-68``).

``lengthscale`` may be a float (isotropic) or a 1-D array (ARD). There is no
``.to(device)`` — placement is sharding metadata under JAX.
"""

from dataclasses import dataclass
from typing import Any, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.checkers import _is_float


__all__ = ["KernelConfig", "_is_kernel_config"]


@dataclass(kw_only=True, frozen=False)
class KernelConfig:
    """Kernel hyperparameters.

    Attributes:
        const_scaling: scalar multiplier on the kernel matrix.
        lengthscale: float or 1-D array (ARD, one scale per feature).
    """

    const_scaling: float = 1.0
    lengthscale: Union[float, jax.Array]

    def __post_init__(self):
        _is_float(self.const_scaling, "const_scaling")
        if not isinstance(self.lengthscale, (float, jax.Array, np.ndarray)):
            raise TypeError(
                f"lengthscale is of type {type(self.lengthscale).__name__}, "
                "but expected type float or jax.Array"
            )
        if isinstance(self.lengthscale, (jax.Array, np.ndarray)):
            if self.lengthscale.ndim != 1:
                raise ValueError(
                    f"lengthscale has {self.lengthscale.ndim} dimensions, "
                    "but expected 1 dimension"
                )

    def to_dict(self) -> dict:
        return {
            "const_scaling": self.const_scaling,
            "lengthscale": (
                np.asarray(self.lengthscale).tolist()
                if isinstance(self.lengthscale, (jax.Array, np.ndarray))
                else self.lengthscale
            ),
        }

    def lengthscale_array(self, dtype) -> jax.Array:
        """Lengthscale as a broadcastable (1, d)-compatible array."""
        ls = self.lengthscale
        if isinstance(ls, (jax.Array, np.ndarray)):
            return jnp.asarray(ls, dtype=dtype)
        return jnp.asarray(ls, dtype=dtype)


def _is_kernel_config(param: Any, param_name: str):
    if not isinstance(param, KernelConfig):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, "
            "but expected type KernelConfig"
        )
