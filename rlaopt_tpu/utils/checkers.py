"""Input validation helpers.

TPU-native re-design of the reference validator layer
(``rlaopt/utils/input_checkers.py:8-147``): the same TypeError/ValueError
contract, re-targeted at JAX arrays, dtypes, and PRNG keys instead of torch
tensors/devices.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


__all__ = [
    "_is_bool",
    "_is_callable",
    "_is_dict",
    "_is_float",
    "_is_int",
    "_is_list",
    "_is_set",
    "_is_str",
    "_is_array",
    "_is_array_1d_2d",
    "_is_dtype",
    "_is_dtype_f32_f64",
    "_is_nonneg_float",
    "_is_pos_float",
    "_is_pos_int",
    "_is_key",
    "_as_key",
]


def _is_bool(param: Any, param_name: str):
    if not isinstance(param, bool):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type bool"
        )


def _is_callable(param: Any, param_name: str):
    if not callable(param):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, "
            "but expected type callable"
        )


def _is_dict(param: Any, param_name: str):
    if not isinstance(param, dict):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type dict"
        )


def _is_float(param: Any, param_name: str):
    if not isinstance(param, float):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type float"
        )


def _is_int(param: Any, param_name: str):
    if isinstance(param, bool) or not isinstance(param, (int, np.integer)):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type int"
        )


def _is_list(param: Any, param_name: str):
    if not isinstance(param, list):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type list"
        )


def _is_set(param: Any, param_name: str):
    if not isinstance(param, set):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type set"
        )


def _is_str(param: Any, param_name: str):
    if not isinstance(param, str):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, but expected type str"
        )


def _is_array(param: Any, param_name: str):
    if not isinstance(param, (jax.Array, np.ndarray)):
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, "
            "but expected a jax.Array"
        )


def _is_array_1d_2d(param: Any, param_name: str):
    _is_array(param, param_name)
    if param.ndim not in (1, 2):
        raise ValueError(
            f"{param_name} must be a 1D or 2D array. Received {param.ndim}D array."
        )


def _is_dtype(param: Any, param_name: str):
    try:
        jnp.dtype(param)
    except TypeError:
        raise TypeError(
            f"{param_name} is of type {type(param).__name__}, "
            "but expected a jax/numpy dtype"
        )


def _is_dtype_f32_f64(param: Any, param_name: str):
    _is_dtype(param, param_name)
    if jnp.dtype(param) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(
            f"{param_name} is {param}, but expected float32 or float64"
        )


def _is_nonneg_float(param: Any, param_name: str):
    _is_float(param, param_name)
    if param < 0:
        raise ValueError(f"{param_name} must be non-negative, but received {param}")


def _is_pos_float(param: Any, param_name: str):
    _is_float(param, param_name)
    if param <= 0:
        raise ValueError(f"{param_name} must be positive, but received {param}")


def _is_pos_int(param: Any, param_name: str):
    _is_int(param, param_name)
    if param <= 0:
        raise ValueError(f"{param_name} must be positive, but received {param}")


def _is_key(param: Any, param_name: str):
    """Check that ``param`` is a JAX PRNG key."""
    if not isinstance(param, jax.Array) or not jnp.issubdtype(
        param.dtype, jax.dtypes.prng_key
    ):
        # Also allow raw uint32 key arrays of shape (2,)
        if not (
            isinstance(param, jax.Array)
            and param.dtype == jnp.uint32
            and param.shape == (2,)
        ):
            raise TypeError(
                f"{param_name} is of type {type(param).__name__}, "
                "but expected a jax PRNG key"
            )


def _as_key(key: Any, param_name: str = "key"):
    """Coerce ``key`` to a JAX PRNG key.

    Accepts an existing key, an int seed, or None (fresh key from the module
    RNG, see :mod:`rlaopt_tpu.utils.rng`).
    """
    from .rng import next_key

    if key is None:
        return next_key()
    if isinstance(key, (int, np.integer)):
        return jax.random.PRNGKey(int(key))
    _is_key(key, param_name)
    return key
