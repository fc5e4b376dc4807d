"""Sparse tensor tests vs scipy/numpy float64 oracles.

Mirrors the reference conventions (tests/sparse/): universal parametrized
matmul test over {layout} × {forward, transpose} × {left, right} × {1D, 2D},
scipy round-trip, row slicing, invalid-input error paths — plus explicit
XLA-vs-native backend agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rlaopt_tpu.sparse import (
    SparseCSRTensor,
    csc_matmat,
    csc_matvec,
    csr_matmat,
    csr_matvec,
    native_available,
)
from rlaopt_tpu.sparse.sparse_tensor import _Layout

N, M = 40, 30


@pytest.fixture
def mat(dtype):
    Msp = sp.random(
        N, M, density=0.2, format="csr", random_state=0,
        dtype=np.float64,
    ).astype(np.dtype(dtype))
    return SparseCSRTensor(Msp), Msp.toarray()


class TestConstruction:
    def test_from_scipy_and_roundtrip(self, mat, tol):
        A, Md = mat
        assert A.shape == (N, M)
        assert np.allclose(A.to_scipy().toarray(), Md, atol=tol)
        assert np.allclose(A.todense(), Md, atol=tol)

    def test_from_raw_buffers(self, mat, tol):
        A, Md = mat
        B = SparseCSRTensor(A.values, A.indices, A.indptr, A.shape)
        assert np.allclose(B.todense(), Md, atol=tol)

    def test_invalid(self, mat):
        A, _ = mat
        with pytest.raises(TypeError):
            SparseCSRTensor(A.values)  # missing buffers
        with pytest.raises(ValueError):
            SparseCSRTensor(A.values, A.indices, A.indptr[:-1], A.shape)

    def test_astype_nnz(self, mat):
        A, Md = mat
        assert A.nnz == int((Md != 0).sum())
        assert A.astype(jnp.float32).dtype == jnp.float32


class TestMatmulUniversal:
    @pytest.mark.parametrize("transpose", [False, True])
    @pytest.mark.parametrize("side", ["left", "right"])
    @pytest.mark.parametrize("ndim", [1, 2])
    def test_all_combinations(self, mat, dtype, tol, transpose, side, ndim):
        A, Md = mat
        op = A.T if transpose else A
        ref = Md.T if transpose else Md
        rows, cols = ref.shape
        if side == "right":
            x = np.linspace(-1, 1, cols * (2 if ndim == 2 else 1))
            x = x.reshape(cols, 2) if ndim == 2 else x
            got = op @ jnp.asarray(x, dtype)
            want = ref @ x
        else:
            x = np.linspace(-1, 1, rows * (2 if ndim == 2 else 1))
            x = x.reshape(2, rows) if ndim == 2 else x
            got = jnp.asarray(x, dtype) @ op
            want = x @ ref
        assert np.allclose(got, want, rtol=1e2 * tol, atol=1e2 * tol)

    def test_dim_errors(self, mat):
        A, _ = mat
        with pytest.raises(ValueError):
            A @ jnp.ones((M + 1,))
        with pytest.raises(ValueError):
            A @ jnp.ones((2, 2, 2))
        with pytest.raises(ValueError):
            jnp.ones((N + 1,)) @ A


class TestRowSlice:
    def test_fancy_index(self, mat, tol):
        A, Md = mat
        idx = [3, 7, 20, 0]
        S = A[idx]
        assert np.allclose(S.todense(), Md[idx], atol=tol)

    def test_slice_and_int(self, mat, tol):
        A, Md = mat
        assert np.allclose(A[2:10].todense(), Md[2:10], atol=tol)
        assert np.allclose(A[5].todense(), Md[5:6], atol=tol)

    def test_negative_index(self, mat, tol):
        A, Md = mat
        assert np.allclose(A[[-1]].todense(), Md[[-1]], atol=tol)

    def test_out_of_bounds(self, mat):
        A, _ = mat
        with pytest.raises(IndexError):
            A[[N]]
        with pytest.raises(TypeError):
            A["rows"]

    def test_csc_not_sliceable(self, mat):
        A, _ = mat
        with pytest.raises(NotImplementedError):
            A.T[0]


class TestBackends:
    def test_native_and_xla_agree(self, mat, dtype, tol):
        A, Md = mat
        x = jnp.asarray(np.linspace(0, 1, M), dtype)
        X = jnp.asarray(np.ones((M, 3)), dtype)
        y_x = csr_matvec(A.values, A.indptr, A.indices, x, N, impl="xla")
        Y_x = csr_matmat(A.values, A.indptr, A.indices, X, N, impl="xla")
        assert np.allclose(y_x, Md @ np.asarray(x), rtol=1e2 * tol, atol=1e2 * tol)
        assert np.allclose(Y_x, Md @ np.asarray(X), rtol=1e2 * tol, atol=1e2 * tol)
        At = A.T
        yt = jnp.asarray(np.linspace(0, 1, N), dtype)
        z_x = csc_matvec(At.values, At.indptr, At.indices, yt, M, impl="xla")
        assert np.allclose(z_x, Md.T @ np.asarray(yt), rtol=1e2 * tol, atol=1e2 * tol)
        if native_available():
            y_n = csr_matvec(A.values, A.indptr, A.indices, x, N, impl="native")
            z_n = csc_matvec(
                At.values, At.indptr, At.indices, yt, M, impl="native"
            )
            Z_n = csc_matmat(
                At.values, At.indptr, At.indices,
                jnp.asarray(np.ones((N, 3)), dtype), M, impl="native",
            )
            assert np.allclose(y_n, y_x, rtol=1e2 * tol, atol=1e2 * tol)
            assert np.allclose(z_n, z_x, rtol=1e2 * tol, atol=1e2 * tol)
            assert np.allclose(
                Z_n, Md.T @ np.ones((N, 3)), rtol=1e2 * tol, atol=1e2 * tol
            )

    def test_xla_path_jittable(self, mat, dtype, tol):
        A, Md = mat
        x = jnp.asarray(np.linspace(0, 1, M), dtype)

        @jax.jit
        def f(v, p, i, xx):
            return csr_matvec(v, p, i, xx, N, impl="xla")

        assert np.allclose(
            f(A.values, A.indptr, A.indices, x), Md @ np.asarray(x),
            rtol=1e2 * tol, atol=1e2 * tol,
        )
