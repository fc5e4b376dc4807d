"""Sparse tensor ↔ solver integration.

The reference feeds ``SparseCSRTensor`` data matrices straight into solve
loops through ``@``/``__rmatmul__`` (``rlaopt/sparse/sparse_tensor.py:114-126``);
here the equivalent surface is ``sparse_aslinop`` (and automatic wrapping
inside ``LinSys``/``LstSq``), checked against dense float64 oracles and an
end-to-end sketch-and-precondition LSQR least-squares solve on sparse data.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rlaopt_tpu.linops import TwoSidedLinOp, aslinop
from rlaopt_tpu.sparse import SparseCSRTensor, sparse_aslinop

N, M = 48, 36


def _rand_sparse(dtype, fmt="csr", m=N, n=M, density=0.15, seed=0):
    Msp = sp.random(
        m, n, density=density, format=fmt, random_state=seed, dtype=np.float64
    ).astype(np.dtype(dtype))
    return Msp


class TestSparseAslinop:
    def test_matches_dense(self, dtype, tol):
        Msp = _rand_sparse(dtype, "csr")
        A = SparseCSRTensor(Msp)
        op = sparse_aslinop(A)
        Md = Msp.toarray()
        x = np.linspace(-1, 1, M).astype(dtype)
        X = np.stack([x, 2 * x], axis=1)
        assert np.allclose(op @ x, Md @ x, atol=50 * tol)
        assert np.allclose(op @ X, Md @ X, atol=50 * tol)
        y = np.linspace(1, 2, N).astype(dtype)
        Y = np.stack([y, -y], axis=1)
        assert np.allclose(y @ op, y @ Md, atol=50 * tol)
        assert np.allclose(Y.T @ op, Y.T @ Md, atol=50 * tol)

    def test_transpose_and_csc(self, dtype, tol):
        Msp = _rand_sparse(dtype)
        A = SparseCSRTensor(Msp)
        Md = Msp.toarray()
        op_t = sparse_aslinop(A).T
        y = np.linspace(-2, 1, N).astype(dtype)
        assert np.allclose(op_t @ y, Md.T @ y, atol=50 * tol)
        # CSC-layout tensor wraps too (adjoint identity on the same buffers)
        op_csc = sparse_aslinop(A.T)  # (M, N) tensor in CSC layout
        assert op_csc.shape == (M, N)
        assert np.allclose(op_csc @ y, Md.T @ y, atol=50 * tol)
        x = np.linspace(0, 1, M).astype(dtype)
        assert np.allclose(x @ op_csc, Md @ x, atol=50 * tol)

    def test_aslinop_dispatch(self, dtype):
        A = SparseCSRTensor(_rand_sparse(dtype))
        op = aslinop(A)
        assert isinstance(op, TwoSidedLinOp)
        assert op.shape == (N, M)
        assert op.dtype == jnp.dtype(dtype)

    def test_jit_and_scale(self, dtype, tol):
        import jax

        A = SparseCSRTensor(_rand_sparse(dtype))
        Md = _rand_sparse(dtype).toarray()
        op = 2.5 * sparse_aslinop(A)
        x = jnp.linspace(-1, 1, M).astype(dtype)

        @jax.jit
        def f(o, v):
            return o @ v

        assert np.allclose(f(op, x), 2.5 * (Md @ np.asarray(x)), atol=50 * tol)


class TestSparseSolve:
    def test_lstsq_lsqr_skpre_sparse(self, key):
        """End-to-end: sparse data matrix through the public LstSq API with
        the sketch-and-precondition LSQR pipeline (BASELINE config #2's
        natural sparse-data workload, at test scale)."""
        from rlaopt_tpu.models import LstSq
        from rlaopt_tpu.preconditioners import SkPreConfig
        from rlaopt_tpu.solvers import LSQRConfig

        m, n = 2000, 120
        rng = np.random.default_rng(3)
        Msp = sp.random(
            m, n, density=0.05, format="csr", random_state=3, dtype=np.float64
        )
        # well-posed but non-trivially conditioned
        Msp = Msp + sp.diags(
            np.ones(n), shape=(m, n), format="csr", dtype=np.float64
        )
        b = rng.standard_normal(m)
        A = SparseCSRTensor(Msp.astype(np.float64))
        model = LstSq(A, jnp.asarray(b))
        cfg = LSQRConfig(
            max_iters=80,
            rtol=1e-10,
            precond_config=SkPreConfig(
                sketch_size=4 * n, rho=0.0, sketch="sparse"
            ),
        )
        W, log = model.solve(
            cfg, jnp.zeros((n, 1), dtype=jnp.float64), callback_freq=10,
            key=key,
        )
        ref = sp.linalg.lsqr(Msp, b, atol=0, btol=0, iter_lim=2000)[0]
        assert np.allclose(np.asarray(W)[:, 0], ref, atol=1e-6)

    def test_linsys_pcg_sparse_normal_eq(self, key):
        """Sparse SPD operator (AᵀA form) through LinSys + PCG."""
        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n = 80
        Msp = sp.random(
            n, n, density=0.2, format="csr", random_state=1, dtype=np.float64
        )
        G = (Msp @ Msp.T).tocsr() + sp.eye(n, format="csr")
        A = SparseCSRTensor(G)
        b = np.linspace(-1, 1, n)
        sys_ = LinSys(A, jnp.asarray(b), reg=1e-8)
        cfg = PCGConfig(
            max_iters=300, rtol=1e-10,
            precond_config=NystromConfig(rank=30, rho=1e-8),
        )
        W, _ = sys_.solve(cfg, jnp.zeros((n, 1), dtype=jnp.float64), key=key)
        ref = np.linalg.solve(G.toarray() + 1e-8 * np.eye(n), b)
        assert np.allclose(np.asarray(W)[:, 0], ref, atol=1e-7)


@pytest.mark.slow
class TestSparse100k:
    def test_lstsq_sparse_100k_x_1k(self, key):
        """The VERDICT-scale workload: sparse 100k×1k least squares through
        the public API (slow-marked; run with `-m slow`)."""
        from rlaopt_tpu.models import LstSq
        from rlaopt_tpu.preconditioners import SkPreConfig
        from rlaopt_tpu.solvers import LSQRConfig

        m, n = 100_000, 1_000
        rng = np.random.default_rng(0)
        Msp = sp.random(
            m, n, density=1e-3, format="csr", random_state=0, dtype=np.float64
        ) + sp.diags(np.ones(n), shape=(m, n), format="csr", dtype=np.float64)
        b = rng.standard_normal(m)
        A = SparseCSRTensor(Msp.astype(np.float32))
        model = LstSq(A, jnp.asarray(b, dtype=jnp.float32))
        cfg = LSQRConfig(
            max_iters=60, rtol=1e-6,
            precond_config=SkPreConfig(
                sketch_size=4 * n, rho=0.0, sketch="sparse"
            ),
        )
        W, log = model.solve(
            cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=10,
            key=key,
        )
        it = max(i for i in log.keys() if isinstance(i, int))
        rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
        assert rel < 1e-4


class TestSparseShardRows:
    """Row-partitioned sparse operator over the mesh (distributed analog of
    the reference's row-chunked operators, ``rlaopt/kernels/base.py:297-302``)."""

    @pytest.mark.parametrize("m", [64, 61])  # even and ragged row chunks
    def test_matches_dense(self, m):
        from rlaopt_tpu.parallel import make_mesh
        from rlaopt_tpu.sparse import sparse_shard_rows

        n = 36
        Msp = _rand_sparse(np.float32, "csr", m=m, n=n, density=0.2, seed=3)
        op = sparse_shard_rows(SparseCSRTensor(Msp), make_mesh())
        D = np.asarray(Msp.todense(), np.float64)
        x = np.linspace(-1, 1, n, dtype=np.float32)
        y = np.linspace(1, -1, m, dtype=np.float32)
        X = np.stack([x, 2 * x], axis=1)

        np.testing.assert_allclose(
            np.asarray(op @ x, np.float64), D @ x, rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(op @ X, np.float64), D @ X, rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(op.T @ y, np.float64), D.T @ y, rtol=0, atol=1e-5
        )

    def test_rejects_csc(self):
        from rlaopt_tpu.parallel import make_mesh
        from rlaopt_tpu.sparse import sparse_shard_rows

        Msp = _rand_sparse(np.float32, "csc")
        with pytest.raises(ValueError, match="CSR"):
            sparse_shard_rows(
                SparseCSRTensor(Msp.tocsr()).T, make_mesh()
            )
