"""Input validation helpers.

TPU-native re-design of the reference validator layer
(``rlaopt/utils/input_checkers.py:8-147``): the same TypeError/ValueError
*contract* (which check fires on which bad input), re-targeted at JAX arrays,
dtypes, and PRNG keys instead of torch tensors/devices. Implementation and
message wording are our own: one ``_require_type`` helper drives the
isinstance checks instead of fifteen hand-rolled bodies.
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


def _require_type(param: Any, param_name: str, types, want: str):
    """Raise TypeError unless ``param`` is an instance of ``types``."""
    if not isinstance(param, types):
        raise TypeError(
            f"expected {param_name} to be {want}; "
            f"got {type(param).__name__} instead"
        )


def _is_bool(param: Any, param_name: str):
    _require_type(param, param_name, bool, "a bool")


def _is_callable(param: Any, param_name: str):
    if not callable(param):
        raise TypeError(
            f"expected {param_name} to be callable; "
            f"got {type(param).__name__} instead"
        )


def _is_dict(param: Any, param_name: str):
    _require_type(param, param_name, dict, "a dict")


def _is_float(param: Any, param_name: str):
    _require_type(param, param_name, float, "a float")


def _is_int(param: Any, param_name: str):
    # bool is an int subclass in Python; reject it explicitly.
    if isinstance(param, bool):
        raise TypeError(f"expected {param_name} to be an int; got bool instead")
    _require_type(param, param_name, (int, np.integer), "an int")


def _is_list(param: Any, param_name: str):
    _require_type(param, param_name, list, "a list")


def _is_set(param: Any, param_name: str):
    _require_type(param, param_name, set, "a set")


def _is_str(param: Any, param_name: str):
    _require_type(param, param_name, str, "a str")


def _is_array(param: Any, param_name: str):
    _require_type(param, param_name, (jax.Array, np.ndarray), "a jax.Array")


def _is_array_1d_2d(param: Any, param_name: str):
    _is_array(param, param_name)
    if param.ndim not in (1, 2):
        raise ValueError(
            f"{param_name} needs 1 or 2 dimensions; this array has {param.ndim}"
        )


def _is_dtype(param: Any, param_name: str):
    try:
        jnp.dtype(param)
    except TypeError:
        raise TypeError(
            f"expected {param_name} to be a jax/numpy dtype; "
            f"got {type(param).__name__} instead"
        )


def _is_dtype_f32_f64(param: Any, param_name: str):
    _is_dtype(param, param_name)
    if jnp.dtype(param) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(
            f"{param_name} must be float32 or float64 (got {param})"
        )


def _is_nonneg_float(param: Any, param_name: str):
    _is_float(param, param_name)
    if param < 0:
        raise ValueError(f"{param_name} cannot be negative (got {param})")


def _is_pos_float(param: Any, param_name: str):
    _is_float(param, param_name)
    if param <= 0:
        raise ValueError(f"{param_name} must be > 0 (got {param})")


def _is_pos_int(param: Any, param_name: str):
    _is_int(param, param_name)
    if param <= 0:
        raise ValueError(f"{param_name} must be > 0 (got {param})")


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
                f"expected {param_name} to be a jax PRNG key; "
                f"got {type(param).__name__} instead"
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
