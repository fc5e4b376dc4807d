"""Fast Walsh–Hadamard transform, TPU-first.

Two implementations, selected by size:

* **MXU (Kronecker-factor) path** — for the sizes SRHT sketching uses, a
  Hadamard transform of length ``p = a*b`` is two dense contractions with the
  small Hadamard matrices ``H_a`` and ``H_b`` (``H_p = H_a ⊗ H_b`` under
  row-major index split, so ``H_p x = H_a X H_b`` with ``X = x.reshape(a, b)``).
  This does ~``p*(a+b)`` FLOPs instead of ``p*log2(p)``, but runs on the
  128×128 systolic array instead of the vector unit — the right trade on TPU.
* **Butterfly path** — the classical ``log2(p)`` reshape/add ladder, used as a
  reference implementation and for interpret-mode checks.

No analog exists in the reference (it has no SRHT); this implements the
BASELINE north-star "SRHT via on-chip FWHT".
"""

import functools

import jax
import jax.numpy as jnp


__all__ = ["fwht", "fwht_butterfly", "hadamard_matrix", "next_pow2"]


def next_pow2(n: int) -> int:
    """Smallest power of two >= n."""
    p = 1
    while p < n:
        p *= 2
    return p


@functools.lru_cache(maxsize=None)
def _hadamard_np(p: int):
    import numpy as np

    if p & (p - 1):
        raise ValueError(f"Hadamard size must be a power of 2, got {p}")
    H = np.array([[1.0]])
    while H.shape[0] < p:
        H = np.block([[H, H], [H, -H]])
    return H


def hadamard_matrix(p: int, dtype=jnp.float32) -> jax.Array:
    """Unnormalized Hadamard matrix of size p (power of 2), Sylvester order."""
    return jnp.asarray(_hadamard_np(p), dtype=dtype)


def fwht_butterfly(x: jax.Array, axis: int = 0) -> jax.Array:
    """Unnormalized WHT along ``axis`` via the classical butterfly ladder."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n & (n - 1):
        raise ValueError(f"FWHT length must be a power of 2, got {n}")
    rest = x.shape[1:]
    h = 1
    while h < n:
        x = x.reshape(n // (2 * h), 2, h, *rest)
        a, b = x[:, 0], x[:, 1]
        x = jnp.stack([a + b, a - b], axis=1).reshape(n, *rest)
        h *= 2
    return jnp.moveaxis(x, 0, axis)


def _factor_pow2(p: int):
    """Split p = a*b with a, b powers of two, as square as possible."""
    import math

    log = int(math.log2(p))
    la = log // 2
    return 2**la, 2 ** (log - la)


def fwht(x: jax.Array, axis: int = 0) -> jax.Array:
    """Unnormalized Walsh–Hadamard transform along ``axis``.

    Uses the MXU Kronecker-factor formulation; lengths must be a power of 2.
    The result matches ``hadamard_matrix(p) @ x`` exactly (Sylvester order).
    """
    x = jnp.moveaxis(x, axis, 0)
    p = x.shape[0]
    if p & (p - 1):
        raise ValueError(f"FWHT length must be a power of 2, got {p}")
    if p == 1:
        return jnp.moveaxis(x, 0, axis)

    a, b = _factor_pow2(p)
    rest = x.shape[1:]
    # H_p = H_a ⊗ H_b with index i = i_a * b + i_b (Sylvester order).
    X = x.reshape(a, b, *rest)
    Ha = hadamard_matrix(a, x.dtype)
    Hb = hadamard_matrix(b, x.dtype)
    # (H_a ⊗ H_b) x == H_a X H_b (H symmetric) — two MXU contractions.
    # HIGHEST precision: excess-precision runtimes would round operands to
    # bf16 before the ±1-weighted sums.
    hp = jax.lax.Precision.HIGHEST
    Y = jnp.tensordot(Ha, X, axes=((1,), (0,)), precision=hp)  # (a, b, *rest)
    Y = jnp.tensordot(Hb, Y, axes=((1,), (1,)), precision=hp)  # (b, a, *rest)
    Y = jnp.swapaxes(Y, 0, 1)  # (a, b, *rest)
    return jnp.moveaxis(Y.reshape(p, *rest), 0, axis)
