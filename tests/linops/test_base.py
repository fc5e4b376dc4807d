"""Operator-semantics matrix for LinOp/TwoSidedLinOp/SymmetricLinOp.

Covers the reference's 8-combination semantics matrix
({forward, transpose} × {left, right mult} × {1D, 2D}) from
tests/kernels/test_standard.py:252-326, applied to the base operators.
"""

import jax
import jax.numpy as jnp
import pytest

from rlaopt_tpu.linops import (
    LinOp,
    TwoSidedLinOp,
    SymmetricLinOp,
    aslinop,
    is_linop,
    _is_linop_or_array,
)


@pytest.fixture
def mats(key, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    M = jax.random.normal(k1, (7, 5), dtype=dtype)
    x = jax.random.normal(k2, (5,), dtype=dtype)
    X = jax.random.normal(k3, (5, 3), dtype=dtype)
    return M, x, X


class TestLinOp:
    def test_matvec_matmat(self, mats, tol):
        M, x, X = mats
        A = LinOp(M.shape, matvec=lambda v: M @ v, dtype=M.dtype)
        assert jnp.allclose(A @ x, M @ x, rtol=tol, atol=tol)
        # matmat auto-derived via vmap
        assert jnp.allclose(A @ X, M @ X, rtol=tol, atol=tol)

    def test_explicit_matmat(self, mats, tol):
        M, x, X = mats
        A = LinOp(M.shape, matvec=lambda v: M @ v, matmat=lambda V: M @ V)
        assert jnp.allclose(A @ X, M @ X, rtol=tol, atol=tol)

    def test_payload_style(self, mats, tol):
        M, x, X = mats
        A = LinOp(M.shape, matvec=lambda d, v: d @ v, data=M, dtype=M.dtype)
        assert jnp.allclose(A @ x, M @ x, rtol=tol, atol=tol)
        assert jnp.allclose(A @ X, M @ X, rtol=tol, atol=tol)

    def test_shape_validation(self, mats):
        M, x, X = mats
        A = LinOp(M.shape, matvec=lambda v: M @ v)
        with pytest.raises(ValueError):
            A @ jnp.zeros((M.shape[1] + 1,))
        with pytest.raises(ValueError):
            A @ jnp.zeros((2, 2, 2))

    def test_rmatmul_raises(self, mats):
        M, x, X = mats
        A = LinOp(M.shape, matvec=lambda v: M @ v)
        with pytest.raises(TypeError):
            jnp.zeros(M.shape[0]).__matmul__(A)  # no adjoint defined
            A.__rmatmul__(jnp.zeros(M.shape[0]))

    def test_scaling(self, mats, tol):
        M, x, X = mats
        A = LinOp(M.shape, matvec=lambda v: M @ v, dtype=M.dtype)
        B = 2.0 * A
        assert jnp.allclose(B @ x, 2.0 * (M @ x), rtol=tol, atol=tol)
        # nested scaling merges
        C = 3.0 * B
        assert jnp.allclose(C @ x, 6.0 * (M @ x), rtol=tol, atol=tol)
        assert jnp.allclose((-A) @ x, -(M @ x), rtol=tol, atol=tol)

    def test_jit_through_pytree(self, mats, tol):
        M, x, X = mats
        A = aslinop(M)

        @jax.jit
        def f(op, v):
            return op @ v

        assert jnp.allclose(f(A, x), M @ x, rtol=tol, atol=tol)
        # new payload, same structure: should not error (and should reuse trace)
        A2 = aslinop(M + 1.0)
        assert jnp.allclose(f(A2, x), (M + 1.0) @ x, rtol=tol, atol=tol)


class TestTwoSidedLinOp:
    def test_all_eight_combinations(self, mats, tol):
        M, x, X = mats
        A = TwoSidedLinOp(
            M.shape,
            matvec=lambda v: M @ v,
            rmatvec=lambda v: M.T @ v,
            dtype=M.dtype,
        )
        y = jnp.ones(M.shape[0], dtype=M.dtype)
        Y = jnp.ones((4, M.shape[0]), dtype=M.dtype)

        # forward, right-mult
        assert jnp.allclose(A @ x, M @ x, rtol=tol, atol=tol)
        assert jnp.allclose(A @ X, M @ X, rtol=tol, atol=tol)
        # forward, left-mult
        assert jnp.allclose(y @ A, y @ M, rtol=tol, atol=tol)
        assert jnp.allclose(Y @ A, Y @ M, rtol=tol, atol=tol)
        # transpose, right-mult
        assert jnp.allclose(A.T @ y, M.T @ y, rtol=tol, atol=tol)
        assert jnp.allclose(A.T @ Y.T, M.T @ Y.T, rtol=tol, atol=tol)
        # transpose, left-mult
        assert jnp.allclose(x @ A.T, x @ M.T, rtol=tol, atol=tol)
        assert jnp.allclose(X.T @ A.T, X.T @ M.T, rtol=tol, atol=tol)

    def test_double_transpose(self, mats, tol):
        M, x, X = mats
        A = aslinop(M)
        assert A.T.T.shape == A.shape
        assert jnp.allclose(A.T.T @ x, M @ x, rtol=tol, atol=tol)

    def test_transpose_preserves_scale(self, mats, tol):
        M, x, X = mats
        A = 2.0 * aslinop(M)
        y = jnp.ones(M.shape[0], dtype=M.dtype)
        assert jnp.allclose(A.T @ y, 2.0 * (M.T @ y), rtol=tol, atol=tol)

    def test_todense(self, mats, tol):
        M, x, X = mats
        assert jnp.allclose(aslinop(M).todense(), M, rtol=tol, atol=tol)


class TestSymmetricLinOp:
    def test_symmetric(self, key, dtype, tol):
        G = jax.random.normal(key, (6, 6), dtype=dtype)
        S = G + G.T
        A = SymmetricLinOp(S.shape, matvec=lambda v: S @ v, dtype=dtype)
        x = jnp.arange(6, dtype=dtype)
        assert A.T is A
        assert jnp.allclose(A @ x, S @ x, rtol=tol, atol=tol)
        assert jnp.allclose(x @ A, x @ S, rtol=tol, atol=tol)

    def test_square_required(self):
        with pytest.raises(ValueError):
            SymmetricLinOp((3, 4), matvec=lambda v: v)


class TestComposition:
    def test_compose(self, key, dtype, tol):
        k1, k2 = jax.random.split(key)
        M1 = jax.random.normal(k1, (4, 6), dtype=dtype)
        M2 = jax.random.normal(k2, (6, 5), dtype=dtype)
        C = aslinop(M1) @ aslinop(M2)
        x = jnp.ones(5, dtype=dtype)
        assert C.shape == (4, 5)
        assert jnp.allclose(C @ x, M1 @ (M2 @ x), rtol=tol, atol=tol)

    def test_compose_shape_mismatch(self, key):
        M = jax.random.normal(key, (4, 6))
        with pytest.raises(ValueError):
            aslinop(M) @ aslinop(M)


def test_type_helpers(key):
    M = jax.random.normal(key, (3, 3))
    assert is_linop(aslinop(M))
    assert not is_linop(M)
    _is_linop_or_array(M, "M")
    _is_linop_or_array(aslinop(M), "A")
    with pytest.raises(TypeError):
        _is_linop_or_array("nope", "x")


class TestScaleMixin:
    def test_compat_shim(self):
        from rlaopt_tpu.linops import ScaleMixin
        from rlaopt_tpu.linops.mixins import _ScaledFunction

        class Obj(ScaleMixin):
            pass

        o = Obj()
        o._initialize_scaling(2.0)
        assert o._apply_scaling(3.0) == 6.0
        f = o._apply_scaling(lambda x: x + 1)
        assert f(1.0) == 4.0
        # nested scales merge multiplicatively
        o2 = Obj()
        o2._initialize_scaling(3.0)
        g = o2._apply_scaling(f)
        assert isinstance(g, _ScaledFunction) and g.scale == 6.0
        assert g(1.0) == 12.0
        # unit scale: passthrough
        o3 = Obj()
        o3._initialize_scaling(1.0)
        h = lambda x: x  # noqa: E731
        assert o3._apply_scaling(h) is h
