"""Kernel operator tests vs naive scalar oracles.

Ports the reference conventions (SURVEY §4): dual precision, tolerance dicts,
operator-semantics matrix (forward/transpose × left/right × 1D/2D), ARD
lengthscales, const scaling, row/blk oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.kernels import (
    KERNEL_KINDS,
    KernelConfig,
    KernelLinOp,
    LaplaceLinOp,
    Matern32LinOp,
    RBFLinOp,
)
from rlaopt_tpu.ops.kernel_xla import kernel_matmat_xla

from .utils import compute_kernel_matrix

N1, N2, D = 33, 21, 5  # deliberately non-multiples of any block size


@pytest.fixture
def data(key, dtype):
    k1, k2 = jax.random.split(key)
    X1 = jax.random.normal(k1, (N1, D), dtype=dtype)
    X2 = jax.random.normal(k2, (N2, D), dtype=dtype)
    return X1, X2


@pytest.mark.parametrize("kind", KERNEL_KINDS)
class TestKernelMatmat:
    def test_matches_oracle(self, data, kind, dtype, tol):
        X1, X2 = data
        ls = 1.3
        K_ref = compute_kernel_matrix(kind, X1, X2, ls)
        v = np.linspace(-1, 1, N2)
        got = kernel_matmat_xla(
            kind, X1, X2, jnp.asarray(v, dtype), ls
        )
        want = K_ref @ v
        assert np.allclose(got, want, rtol=1e3 * tol, atol=1e3 * tol)

    def test_ard_lengthscale(self, data, kind, dtype, tol):
        X1, X2 = data
        ls = np.linspace(0.5, 2.0, D)
        K_ref = compute_kernel_matrix(kind, X1, X2, ls)
        V = np.ones((N2, 2))
        got = kernel_matmat_xla(
            kind, X1, X2, jnp.asarray(V, dtype), jnp.asarray(ls, dtype)
        )
        assert np.allclose(got, K_ref @ V, rtol=1e3 * tol, atol=1e3 * tol)

    def test_small_row_block_streams(self, data, kind, dtype, tol):
        """Blocked streaming (row_block < n) must agree with one-shot."""
        X1, X2 = data
        v = jnp.ones((N2,), dtype)
        a = kernel_matmat_xla(kind, X1, X2, v, 1.0, row_block=8)
        b = kernel_matmat_xla(kind, X1, X2, v, 1.0, row_block=64)
        assert np.allclose(a, b, rtol=1e2 * tol, atol=1e2 * tol)


class TestKernelLinOp:
    def test_operator_semantics_matrix(self, data, dtype, tol):
        """All 8 {forward,transpose} × {left,right} × {1D,2D} combinations."""
        X1, X2 = data
        cfg = KernelConfig(const_scaling=2.0, lengthscale=0.9)
        K = compute_kernel_matrix("rbf", X1, X2, 0.9, const_scaling=2.0)
        A = RBFLinOp(X1, X2, cfg)
        rt, at = 1e3 * tol, 1e3 * tol

        x = np.linspace(0, 1, N2)
        Xm = np.ones((N2, 3))
        y = np.linspace(0, 1, N1)
        Ym = np.ones((4, N1))
        assert np.allclose(A @ jnp.asarray(x, dtype), K @ x, rtol=rt, atol=at)
        assert np.allclose(A @ jnp.asarray(Xm, dtype), K @ Xm, rtol=rt, atol=at)
        assert np.allclose(
            jnp.asarray(y, dtype) @ A, y @ K, rtol=rt, atol=at
        )
        assert np.allclose(
            jnp.asarray(Ym, dtype) @ A, Ym @ K, rtol=rt, atol=at
        )
        At = A.T
        assert np.allclose(
            At @ jnp.asarray(y, dtype), K.T @ y, rtol=rt, atol=at
        )
        assert np.allclose(
            At @ jnp.asarray(Ym.T, dtype), K.T @ Ym.T, rtol=rt, atol=at
        )
        assert np.allclose(
            jnp.asarray(x, dtype) @ At, x @ K.T, rtol=rt, atol=at
        )
        assert np.allclose(
            jnp.asarray(Xm.T, dtype) @ At, Xm.T @ K.T, rtol=rt, atol=at
        )

    def test_oracles(self, data, dtype, tol):
        X1, X2 = data
        cfg = KernelConfig(lengthscale=1.1)
        A = Matern32LinOp(X1, X1, cfg)  # square, symmetric data
        K = compute_kernel_matrix("matern32", X1, X1, 1.1)
        blk = jnp.asarray([3, 7, 11, 20])
        v_full = np.ones(N1)
        v_blk = np.ones(4)
        row = A.row_oracle(blk)
        assert row.shape == (4, N1)
        assert np.allclose(
            row @ jnp.asarray(v_full, dtype),
            K[np.asarray(blk)] @ v_full,
            rtol=1e3 * tol,
            atol=1e3 * tol,
        )
        blkop = A.blk_oracle(blk)
        assert blkop.shape == (4, 4)
        assert np.allclose(
            blkop @ jnp.asarray(v_blk, dtype),
            K[np.ix_(np.asarray(blk), np.asarray(blk))] @ v_blk,
            rtol=1e3 * tol,
            atol=1e3 * tol,
        )

    def test_jit_through_pytree(self, data, dtype, tol):
        X1, X2 = data
        A = LaplaceLinOp(X1, X2, KernelConfig(lengthscale=1.0))

        @jax.jit
        def f(op, v):
            return op @ v

        v = jnp.ones((N2,), dtype)
        K = compute_kernel_matrix("laplace", X1, X2, 1.0)
        assert np.allclose(f(A, v), K @ np.ones(N2), rtol=1e3 * tol, atol=1e3 * tol)

    def test_oracle_inside_jit_traced_blk(self, data, dtype, tol):
        """SAP calls oracles with traced indices inside lax.scan."""
        X1, _ = data
        A = RBFLinOp(X1, X1, KernelConfig(lengthscale=1.0))
        K = compute_kernel_matrix("rbf", X1, X1, 1.0)

        @jax.jit
        def f(op, blk, v):
            return op.blk_oracle(blk) @ v

        blk = jnp.asarray([1, 5, 9])
        got = f(A, blk, jnp.ones((3,), dtype))
        want = K[np.ix_(np.asarray(blk), np.asarray(blk))] @ np.ones(3)
        assert np.allclose(got, want, rtol=1e3 * tol, atol=1e3 * tol)

    def test_validation(self, data):
        X1, X2 = data
        with pytest.raises(TypeError):
            KernelLinOp(X1, X2, "nope", "rbf")
        with pytest.raises(ValueError):
            KernelLinOp(X1[:, 0], X2, KernelConfig(lengthscale=1.0), "rbf")
        with pytest.raises(ValueError):
            KernelConfig(lengthscale=jnp.ones((2, 2)))
        with pytest.raises(TypeError):
            KernelConfig(lengthscale="wide")


class TestComputeDtypeAliases:
    """Tier-spelling canonicalization at operator construction."""

    def test_bf16_alias(self):
        from rlaopt_tpu.ops.kernel_pallas import normalize_compute_dtype

        assert normalize_compute_dtype(None) is None
        assert normalize_compute_dtype("bf16x3") == "bf16x3"
        for alias in ("bf16", "bfloat16", jnp.bfloat16):
            assert normalize_compute_dtype(alias) == "bfloat16"
        with pytest.raises(ValueError):
            normalize_compute_dtype("fp8")
        with pytest.raises(ValueError):
            normalize_compute_dtype("float32")

    def test_operator_accepts_alias(self, key):
        X = jax.random.normal(key, (16, 4), dtype=jnp.float32)
        op = RBFLinOp(X, X, KernelConfig(lengthscale=1.0),
                      compute_dtype="bf16")
        assert op.compute_dtype == "bfloat16"
        with pytest.raises(ValueError):
            RBFLinOp(X, X, KernelConfig(lengthscale=1.0),
                     compute_dtype="fp8")
