"""Closed-form kernel tile formulas.

Parity with the five KeOps formulas in ``rlaopt/kernels/standard.py:31-86``
(RBF, Laplace, Matérn 1/2, 3/2, 5/2), re-targeted at dense tiles:

* Squared-distance kernels use the MXU-friendly expansion
  ``‖x‖² + ‖y‖² − 2·x·yᵀ`` — one big matmul instead of an O(n·m·d)
  broadcast — clamped at zero before any sqrt.
* The Laplace (L1) kernel has no matmul form; it uses a feature-chunked
  broadcast reduction on the VPU.

These functions evaluate *tiles* (inputs are expected pre-scaled by the
lengthscale); the streaming drivers in :mod:`rlaopt_tpu.ops.kernel_xla` /
``kernel_pallas`` never materialize the full Gram matrix.
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from jax import lax


__all__ = [
    "KERNEL_KINDS",
    "kernel_tile",
    "sqdist_tile",
    "l1dist_tile",
    "scale_inputs",
]

_SQRT3 = 3.0**0.5
_SQRT5 = 5.0**0.5


def scale_inputs(X: jax.Array, lengthscale) -> jax.Array:
    """X / ℓ with float or ARD (d,) lengthscale."""
    ls = jnp.asarray(lengthscale, dtype=X.dtype)
    return X / ls


def sqdist_tile(Xs: jax.Array, Ys: jax.Array, precision=lax.Precision.HIGHEST):
    """Pairwise squared distances ‖xᵢ−yⱼ‖² via the matmul expansion, ≥ 0."""
    xn = jnp.sum(Xs * Xs, axis=1)[:, None]
    yn = jnp.sum(Ys * Ys, axis=1)[None, :]
    cross = jnp.matmul(Xs, Ys.T, precision=precision)
    return jnp.maximum(xn + yn - 2.0 * cross, 0.0)


def l1dist_tile(Xs: jax.Array, Ys: jax.Array, chunk: int = 16):
    """Pairwise L1 distances Σ_d |xᵢd − yⱼd| by feature-chunked broadcast."""
    m, d = Xs.shape
    n = Ys.shape[0]
    nchunks = -(-d // chunk)
    pad = nchunks * chunk - d
    if pad:
        Xs = jnp.pad(Xs, ((0, 0), (0, pad)))
        Ys = jnp.pad(Ys, ((0, 0), (0, pad)))

    def body(c, acc):
        xs = lax.dynamic_slice_in_dim(Xs, c * chunk, chunk, axis=1)
        ys = lax.dynamic_slice_in_dim(Ys, c * chunk, chunk, axis=1)
        return acc + jnp.sum(jnp.abs(xs[:, None, :] - ys[None, :, :]), axis=-1)

    return lax.fori_loop(
        0, nchunks, body, jnp.zeros((m, n), dtype=Xs.dtype)
    )


def _rbf(Xs, Ys, precision):
    """exp(−‖Δ‖²/2) — rlaopt/kernels/standard.py:46-52."""
    return jnp.exp(-0.5 * sqdist_tile(Xs, Ys, precision))


def _laplace(Xs, Ys, precision):
    """exp(−‖Δ‖₁) — rlaopt/kernels/standard.py:55-61."""
    del precision
    return jnp.exp(-l1dist_tile(Xs, Ys))


def _matern12(Xs, Ys, precision):
    """exp(−‖Δ‖) — rlaopt/kernels/standard.py:64-69."""
    return jnp.exp(-jnp.sqrt(sqdist_tile(Xs, Ys, precision)))


def _matern32(Xs, Ys, precision):
    """(1+√3D)·exp(−√3D) — rlaopt/kernels/standard.py:72-77."""
    D = jnp.sqrt(sqdist_tile(Xs, Ys, precision))
    return (1.0 + _SQRT3 * D) * jnp.exp(-_SQRT3 * D)


def _matern52(Xs, Ys, precision):
    """(1+√5D+5/3·D²)·exp(−√5D) — rlaopt/kernels/standard.py:80-85."""
    D2 = sqdist_tile(Xs, Ys, precision)
    D = jnp.sqrt(D2)
    return (1.0 + _SQRT5 * D + (5.0 / 3.0) * D2) * jnp.exp(-_SQRT5 * D)


_KERNELS: Dict[str, Callable] = {
    "rbf": _rbf,
    "laplace": _laplace,
    "matern12": _matern12,
    "matern32": _matern32,
    "matern52": _matern52,
}

KERNEL_KINDS = tuple(_KERNELS)


def kernel_tile(
    kind: str,
    Xs: jax.Array,
    Ys: jax.Array,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Evaluate the (pre-scaled) kernel tile k(Xs, Ys) of shape (m, n)."""
    try:
        fn = _KERNELS[kind]
    except KeyError:
        raise ValueError(
            f"Unknown kernel kind {kind!r}; expected one of {KERNEL_KINDS}"
        )
    return fn(Xs, Ys, precision)
