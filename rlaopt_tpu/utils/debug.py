"""Numerical-debug helpers.

The reference's only failure handling is worker-exception forwarding
(SURVEY §5); in a single-controller SPMD program the failure modes that
matter are numerical (NaN/Inf propagation through compiled loops) and
divergence. These helpers make them observable without leaving jit.
"""

import contextlib
from typing import Any

import jax
import jax.numpy as jnp


__all__ = ["check_finite", "debug_nans", "assert_finite_tree"]


def check_finite(x: jax.Array, name: str = "value") -> jax.Array:
    """Inside-jit finite check: prints (host callback) when violated.

    Returns ``x`` unchanged; usable as a pass-through tap in traced code.
    """
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))

    def _report(b):
        if b:
            print(f"[rlaopt_tpu] non-finite values detected in {name}")

    jax.debug.callback(_report, bad)
    return x


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager toggling JAX's global NaN checker."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Host-side assertion that every array leaf in a pytree is finite."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )
