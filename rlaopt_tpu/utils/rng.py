"""Package-level RNG convenience.

JAX is purely functional: all randomness flows through explicit PRNG keys.
The functional core of this package (sketch embeddings, solvers, estimators)
always takes explicit keys. For API ergonomics matching the reference's
implicit-global-RNG style (e.g. ``torch.randn`` in
``rlaopt/sketches/gauss.py:47``), the object-oriented shell may omit the key,
in which case a process-global key chain is split here.

Call :func:`seed` for reproducibility of the implicit path.
"""

import threading

import jax


__all__ = ["seed", "next_key"]

_lock = threading.Lock()
# Lazy: creating a PRNG key initializes the XLA backend, and importing a
# library must not do that (it breaks jax.distributed.initialize, which has
# to run before any backend touch in multi-host programs).
_state = {"key": None}


def seed(s: int) -> None:
    """Seed the package-global key chain (analog of ``torch.manual_seed``)."""
    with _lock:
        _state["key"] = jax.random.PRNGKey(s)


def next_key() -> jax.Array:
    """Split a fresh key off the package-global chain."""
    with _lock:
        if _state["key"] is None:
            _state["key"] = jax.random.PRNGKey(0)
        _state["key"], sub = jax.random.split(_state["key"])
    return sub
