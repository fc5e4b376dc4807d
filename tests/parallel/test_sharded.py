"""Sharded operator tests on the virtual 8-device CPU mesh.

Mirrors the reference's multi-device-without-a-cluster strategy (SURVEY §4.4):
the REAL sharded code paths (shard_map + collectives) run on 8 virtual XLA
CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.kernels import (
    KernelConfig,
    ShardedRBFLinOp,
    DistributedRBFLinOp,
    ShardedMatern32LinOp,
)
from rlaopt_tpu.linops import ShardedLinOp, DistributedSymmetricLinOp
from rlaopt_tpu.models import LinSys
from rlaopt_tpu.parallel import make_mesh
from rlaopt_tpu.preconditioners import NystromConfig
from rlaopt_tpu.solvers import PCGConfig, SAPConfig, SAPAccelConfig

from ..kernels.utils import compute_kernel_matrix


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


class TestShardedDenseLinOp:
    @pytest.mark.parametrize("mode", ["row", "column"])
    @pytest.mark.parametrize("n,m", [(64, 40), (61, 37)])  # even and ragged
    def test_matvec_semantics(self, key, dtype, tol, mesh, mode, n, m):
        M = jax.random.normal(key, (n, m), dtype=dtype)
        A = ShardedLinOp.from_dense(M, mesh, mode=mode)
        x = jnp.ones((m,), dtype)
        X = jnp.ones((m, 3), dtype)
        y = jnp.ones((n,), dtype)
        Y = jnp.ones((4, n), dtype)
        rt = 100 * tol
        assert np.allclose(A @ x, M @ x, rtol=rt, atol=rt)
        assert np.allclose(A @ X, M @ X, rtol=rt, atol=rt)
        assert np.allclose(y @ A, y @ M, rtol=rt, atol=rt)
        assert np.allclose(Y @ A, Y @ M, rtol=rt, atol=rt)
        # transpose flips mode
        At = A.T
        assert At.shape == (m, n)
        assert np.allclose(At @ y, M.T @ y, rtol=rt, atol=rt)
        assert np.allclose(x @ At, x @ M.T, rtol=rt, atol=rt)

    @pytest.mark.parametrize("mode", ["row", "column"])
    def test_ragged_local_ops_match_dense(self, key, dtype, tol, mesh, mode):
        """8 unequal per-device chunks (reference torch.chunk ergonomics,
        ``rlaopt/linops/base.py:297-302``) must reproduce the dense result."""
        from rlaopt_tpu.linops import TwoSidedLinOp

        sizes = [7, 3, 9, 5, 8, 2, 6, 4]
        n, m_other = sum(sizes), 24
        shape = (n, m_other) if mode == "row" else (m_other, n)
        M = jax.random.normal(key, shape, dtype=dtype)

        def mv(d, x):
            return d @ x

        def rmv(d, y):
            return d.T @ y

        ops, off = [], 0
        for sz in sizes:
            chunk = (
                M[off : off + sz, :] if mode == "row" else M[:, off : off + sz]
            )
            ops.append(
                TwoSidedLinOp(
                    chunk.shape, mv, rmv, data=chunk, dtype=dtype
                )
            )
            off += sz
        A = ShardedLinOp.from_local_ops(ops, mesh, mode=mode)
        assert A.shape == M.shape

        rt = 100 * tol
        x = jnp.linspace(-1, 1, M.shape[1]).astype(dtype)
        X = jax.random.normal(jax.random.fold_in(key, 1), (M.shape[1], 3), dtype)
        y = jnp.linspace(1, -1, M.shape[0]).astype(dtype)
        Y = jax.random.normal(jax.random.fold_in(key, 2), (4, M.shape[0]), dtype)
        assert np.allclose(A @ x, M @ x, rtol=rt, atol=rt)
        assert np.allclose(A @ X, M @ X, rtol=rt, atol=rt)
        assert np.allclose(y @ A, y @ M, rtol=rt, atol=rt)
        assert np.allclose(Y @ A, Y @ M, rtol=rt, atol=rt)
        At = A.T
        assert At.shape == (M.shape[1], M.shape[0])
        assert np.allclose(At @ y, M.T @ y, rtol=rt, atol=rt)
        assert np.allclose(x @ At, x @ M.T, rtol=rt, atol=rt)

    def test_symmetric_alias(self, key, dtype, mesh):
        n = 32
        G = jax.random.normal(key, (n, n), dtype=dtype)
        S = G + G.T
        A = DistributedSymmetricLinOp.from_dense(S, mesh, mode="row")
        assert A.T is A
        A.shutdown()  # no-op parity API


class TestShardedKernelLinOp:
    def test_matvec_vs_oracle(self, key, dtype, tol, mesh):
        n, m, d = 41, 29, 4  # ragged on purpose
        k1, k2 = jax.random.split(key)
        X1 = jax.random.normal(k1, (n, d), dtype=dtype)
        X2 = jax.random.normal(k2, (m, d), dtype=dtype)
        cfg = KernelConfig(const_scaling=1.5, lengthscale=0.8)
        A = ShardedRBFLinOp(X1, X2, cfg, mesh=mesh)
        K = compute_kernel_matrix("rbf", X1, X2, 0.8, const_scaling=1.5)
        rt = 1e3 * tol
        v = np.linspace(-1, 1, m)
        V = np.ones((m, 3))
        y = np.ones(n)
        assert np.allclose(A @ jnp.asarray(v, dtype), K @ v, rtol=rt, atol=rt)
        assert np.allclose(A @ jnp.asarray(V, dtype), K @ V, rtol=rt, atol=rt)
        assert np.allclose(jnp.asarray(y, dtype) @ A, y @ K, rtol=rt, atol=rt)
        assert np.allclose(
            A.T @ jnp.asarray(y, dtype), K.T @ y, rtol=rt, atol=rt
        )
        assert DistributedRBFLinOp is ShardedRBFLinOp

    def test_oracles(self, key, dtype, tol, mesh):
        n, d = 40, 3
        X = jax.random.normal(key, (n, d), dtype=dtype)
        cfg = KernelConfig(lengthscale=1.2)
        A = ShardedMatern32LinOp(X, X, cfg, mesh=mesh)
        K = compute_kernel_matrix("matern32", X, X, 1.2)
        blk = jnp.asarray([2, 9, 17, 33])
        rt = 1e3 * tol
        row = A.row_oracle(blk)
        W = np.ones((n, 2))
        assert row.shape == (4, n)
        assert np.allclose(
            row @ jnp.asarray(W, dtype),
            K[np.asarray(blk)] @ W,
            rtol=rt,
            atol=rt,
        )
        blkop = A.blk_oracle(blk)
        got = blkop @ jnp.ones((4,), dtype)
        want = K[np.ix_(np.asarray(blk), np.asarray(blk))] @ np.ones(4)
        assert np.allclose(got, want, rtol=rt, atol=rt)

    def test_oracle_only_mode(self, key, dtype, mesh):
        n, d = 24, 3
        X = jax.random.normal(key, (n, d), dtype=dtype)
        A = ShardedRBFLinOp(
            X, X, KernelConfig(lengthscale=1.0), mesh=mesh,
            use_full_kernel=False,
        )
        with pytest.raises(RuntimeError):
            A @ jnp.ones((n,), dtype)
        # oracles still work
        _ = A.row_oracle(jnp.asarray([0, 5])) @ jnp.ones((n,), dtype)


class TestShardedEndToEnd:
    def test_pcg_krr_sharded(self, key, mesh):
        """Sharded RBF KRR solved with Nyström-PCG (f64 exactness check)."""
        n, d, k = 96, 3, 2
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float64)
        B = jax.random.normal(kb, (n, k), dtype=jnp.float64)
        reg = 1e-4
        cfg = KernelConfig(lengthscale=1.0)
        A = ShardedRBFLinOp(X, X, cfg, mesh=mesh)
        sys_ = LinSys(A, B, reg=reg)
        W, log = sys_.solve(
            PCGConfig(
                max_iters=300, rtol=1e-9,
                precond_config=NystromConfig(rank=60, rho=reg),
            ),
            jnp.zeros_like(B),
            key=key,
        )
        K = compute_kernel_matrix("rbf", X, X, 1.0)
        W_true = np.linalg.solve(K + reg * np.eye(n), np.asarray(B))
        assert np.linalg.norm(W - W_true) / np.linalg.norm(W_true) < 1e-6

    @pytest.mark.slow
    def test_sap_krr_sharded(self, key, mesh):
        """Sharded KRR via SAP block-coordinate with distributed oracles."""
        n, d, k = 64, 3, 2
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float64)
        B = jax.random.normal(kb, (n, k), dtype=jnp.float64)
        reg = 1e-2
        A = ShardedRBFLinOp(X, X, KernelConfig(lengthscale=1.0), mesh=mesh)
        sys_ = LinSys(
            A, B, reg=reg, A_row_oracle=A.row_oracle, A_blk_oracle=A.blk_oracle
        )
        W, log = sys_.solve(
            SAPConfig(
                max_iters=400, rtol=1e-4, blk_sz=16,
                precond_config=NystromConfig(rank=16, rho=reg),
                accel=True, accel_config=SAPAccelConfig(mu=0.05, nu=4.0),
            ),
            jnp.zeros_like(B),
            callback_freq=50,
            key=key,
        )
        it = max(i for i in log.keys() if isinstance(i, int))
        rel = float(
            jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"])
        )
        assert rel < 1e-3


class TestFromLocalOps:
    def test_row_mode(self, key, dtype, tol, mesh):
        """Reference-style construction from per-device local operators."""
        from rlaopt_tpu.linops import TwoSidedLinOp

        ndev = 8
        loc, m = 6, 10
        Ms = [
            jax.random.normal(jax.random.fold_in(key, i), (loc, m), dtype=dtype)
            for i in range(ndev)
        ]
        ops = [
            TwoSidedLinOp(
                (loc, m),
                matvec=lambda d, x: d @ x,
                rmatvec=lambda d, x: d.T @ x,
                dtype=dtype,
                data=M,
            )
            for M in Ms
        ]
        A = ShardedLinOp.from_local_ops(ops, mesh, mode="row")
        M_full = jnp.concatenate(Ms, axis=0)
        assert A.shape == (ndev * loc, m)
        x = jnp.ones((m,), dtype)
        y = jnp.ones((ndev * loc,), dtype)
        assert np.allclose(A @ x, M_full @ x, rtol=100 * tol, atol=100 * tol)
        assert np.allclose(y @ A, y @ M_full, rtol=100 * tol, atol=100 * tol)

    def test_validation(self, key, mesh):
        from rlaopt_tpu.linops import LinOp

        ops = [
            LinOp((3, 4), matvec=lambda d, x: d @ x, data=jnp.ones((3, 4)))
            for _ in range(3)
        ]
        with pytest.raises(ValueError):
            ShardedLinOp.from_local_ops(ops, mesh)  # wrong count


class TestShardedSolverState:
    def test_rhs_and_state_stay_row_sharded(self, key, mesh):
        """Sharding the RHS/W_init row-wise propagates through the entire
        compiled PCG loop (GSPMD): solver state lives distributed, results
        are exact."""
        from jax.sharding import PartitionSpec as P
        from rlaopt_tpu.parallel import shard_rows

        n, d, k = 96, 3, 2
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float64)
        B = shard_rows(jax.random.normal(kb, (n, k), dtype=jnp.float64), mesh)
        W0 = shard_rows(jnp.zeros((n, k), dtype=jnp.float64), mesh)
        A = ShardedRBFLinOp(X, X, KernelConfig(lengthscale=1.0), mesh=mesh)
        sys_ = LinSys(A, B, reg=1e-4)
        W, _ = sys_.solve(
            PCGConfig(
                max_iters=300, rtol=1e-9,
                precond_config=NystromConfig(rank=60, rho=1e-4),
            ),
            W0,
            key=key,
        )
        # row-sharded: trailing None in the spec is equivalent to absent
        assert W.sharding.spec in (P("i"), P("i", None))
        K = compute_kernel_matrix("rbf", X, X, 1.0)
        W_true = np.linalg.solve(K + 1e-4 * np.eye(n), np.asarray(B))
        assert np.linalg.norm(np.asarray(W) - W_true) / np.linalg.norm(W_true) < 1e-6


class TestRingMode:
    """Ring-mode sharded kernel matvec: nothing replicated, shards rotate
    via ppermute (ring-attention analog for Gram matvecs)."""

    @pytest.mark.parametrize("n,m", [(48, 48), (41, 29)])
    def test_matches_replicated(self, key, dtype, tol, mesh, n, m):
        d = 4
        k1, k2 = jax.random.split(key)
        X1 = jax.random.normal(k1, (n, d), dtype=dtype)
        X2 = jax.random.normal(k2, (m, d), dtype=dtype)
        cfg = KernelConfig(const_scaling=1.3, lengthscale=0.9)
        A_ring = ShardedRBFLinOp(X1, X2, cfg, mesh=mesh, memory_mode="ring")
        K = compute_kernel_matrix("rbf", X1, X2, 0.9, const_scaling=1.3)
        rt = 1e3 * tol
        v = np.linspace(-1, 1, m)
        V = np.ones((m, 3))
        y = np.ones(n)
        assert np.allclose(
            A_ring @ jnp.asarray(v, dtype), K @ v, rtol=rt, atol=rt
        )
        assert np.allclose(
            A_ring @ jnp.asarray(V, dtype), K @ V, rtol=rt, atol=rt
        )
        assert np.allclose(
            jnp.asarray(y, dtype) @ A_ring, y @ K, rtol=rt, atol=rt
        )
        assert np.allclose(
            A_ring.T @ jnp.asarray(y, dtype), K.T @ y, rtol=rt, atol=rt
        )

    def test_pcg_through_ring(self, key, mesh):
        n, d = 64, 3
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float64)
        B = jax.random.normal(kb, (n, 2), dtype=jnp.float64)
        reg = 1e-4
        A = ShardedRBFLinOp(
            X, X, KernelConfig(lengthscale=1.0), mesh=mesh,
            memory_mode="ring",
        )
        sys_ = LinSys(A, B, reg=reg)
        W, _ = sys_.solve(
            PCGConfig(
                max_iters=200, rtol=1e-9,
                precond_config=NystromConfig(rank=40, rho=reg),
            ),
            jnp.zeros_like(B),
            key=key,
        )
        K = compute_kernel_matrix("rbf", X, X, 1.0)
        W_true = np.linalg.solve(K + reg * np.eye(n), np.asarray(B))
        assert np.linalg.norm(W - W_true) / np.linalg.norm(W_true) < 1e-6


class TestSymmetricRing:
    """One data set (A1 is A2) in ring mode takes the symmetric half-ring:
    each unordered shard pair is visited once (its K block serving both
    directions via the fused pair kernel), the diagonal runs the triangle
    kernel locally, and one final ppermute delivers the mirror
    accumulators home. Must match the dense Gram exactly (CPU: the pair
    dispatch falls back to two streaming calls — the schedule, gating,
    and routing are what's under test here)."""

    @pytest.mark.parametrize("n", [64, 43])  # exact / ragged shards
    def test_matches_dense_even_ring(self, key, mesh, n):
        d = 4
        X = jax.random.normal(key, (n, d), dtype=jnp.float64)
        cfg = KernelConfig(const_scaling=1.1, lengthscale=0.8)
        A = ShardedRBFLinOp(X, X, cfg, mesh=mesh, memory_mode="ring")
        K = compute_kernel_matrix("rbf", X, X, 0.8, const_scaling=1.1)
        v = np.linspace(-1, 1, n)
        V = np.stack([v, v**2, np.ones(n)], axis=1)
        assert np.allclose(A @ jnp.asarray(v), K @ v, rtol=1e-9, atol=1e-9)
        assert np.allclose(A @ jnp.asarray(V), K @ V, rtol=1e-9, atol=1e-9)
        # square symmetric Gram: the adjoint is the same sweep
        assert np.allclose(
            A.T @ jnp.asarray(v), K @ v, rtol=1e-9, atol=1e-9
        )
        assert np.allclose(
            jnp.asarray(v) @ A, v @ K, rtol=1e-9, atol=1e-9
        )

    @pytest.mark.slow
    def test_matches_dense_odd_ring_subprocess(self):
        """Odd P has no double-covered antipodal step — different gating.

        Runs on a FULL 5-device platform in a subprocess: XLA:CPU
        ppermute over a mesh built on a SUBSET of the platform's devices
        corrupts the heap (measured: flaky glibc aborts and wrong
        results from the pre-existing general ring too), so the odd ring
        cannot be tested in-process against the 8-device conftest
        platform. See make_mesh's docstring."""
        import subprocess
        import sys

        code = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=5"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from rlaopt_tpu.parallel import make_mesh
from rlaopt_tpu.kernels import ShardedRBFLinOp, KernelConfig
from tests.kernels.utils import compute_kernel_matrix
for n in (40, 43):
    X = jax.random.normal(jax.random.PRNGKey(0), (n, 4), dtype=jnp.float64)
    A = ShardedRBFLinOp(X, X, KernelConfig(const_scaling=1.1,
                        lengthscale=0.8), mesh=make_mesh(),
                        memory_mode="ring")
    K = compute_kernel_matrix("rbf", X, X, 0.8, const_scaling=1.1)
    v = np.linspace(-1, 1, n)
    got = np.asarray(A @ jnp.asarray(v))
    rel = np.linalg.norm(got - K @ v) / np.linalg.norm(K @ v)
    assert rel < 1e-12, (n, rel)
print("ODD RING OK")
"""
        env = {
            k: v for k, v in __import__("os").environ.items()
            if not k.startswith(("XLA_", "JAX_"))
        }
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=__import__("os").path.dirname(
                __import__("os").path.dirname(
                    __import__("os").path.dirname(
                        __import__("os").path.abspath(__file__)))),
            env=env, timeout=300,
        )
        assert "ODD RING OK" in res.stdout, res.stdout + res.stderr

    def test_distinct_data_keeps_general_ring(self, key):
        # A1 is not A2 (even if equal-valued): the general ring runs
        n, d = 40, 3
        X = jax.random.normal(key, (n, d), dtype=jnp.float64)
        X_copy = jnp.array(X)
        cfg = KernelConfig(lengthscale=1.0)
        A = ShardedRBFLinOp(X, X_copy, cfg, memory_mode="ring")
        K = compute_kernel_matrix("rbf", X, X, 1.0)
        v = np.linspace(0, 1, n)
        assert np.allclose(A @ jnp.asarray(v), K @ v, rtol=1e-9, atol=1e-9)


class TestShardedCertifiedResiduals:
    """Round 5 (VERDICT r4 item 2): the certified-residual subsystem
    composes with the sharded operator — compensated evaluation and the
    value64 route run across the mesh."""

    @pytest.mark.parametrize("memory_mode", ["replicated", "ring"])
    def test_matmat_compensated_sharded(self, key, mesh, memory_mode):
        n, d, k = 50, 3, 2  # ragged over 8 devices on purpose
        kx, kv = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        V = jax.random.normal(kv, (n, k), dtype=jnp.float32)
        cfg = KernelConfig(const_scaling=1.3, lengthscale=0.9)
        A = ShardedRBFLinOp(X, X, cfg, mesh=mesh, memory_mode=memory_mode)
        hi, lo = A.matmat_compensated(V)
        assert hi.shape == (n, k) and lo.shape == (n, k)
        K = compute_kernel_matrix("rbf", X, X, 0.9, const_scaling=1.3)
        want = np.asarray(K, np.float64) @ np.asarray(V, np.float64)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
        # 1-D operand round-trips
        h1, l1 = A.matmat_compensated(V[:, 0])
        assert h1.shape == (n,)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(hi[:, 0]),
                                   rtol=1e-6)

    def test_matmat_value64_sharded(self, key, mesh):
        """The mesh value64 route matches a host-f64 evaluation at the
        engine's certified grade (chunks round-robined over 8 devices)."""
        n, d = 700, 5
        kx, kv = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        v = jax.random.normal(kv, (n,), dtype=jnp.float32)
        cfg = KernelConfig(const_scaling=0.8, lengthscale=1.4)
        A = ShardedRBFLinOp(X, X, cfg, mesh=mesh)
        hi, lo = A.matmat_value64(np.asarray(v))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        K = compute_kernel_matrix("rbf", X, X, 1.4, const_scaling=0.8)
        want = np.asarray(K, np.float64) @ np.asarray(v, np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1.5e-7, f"sharded value64 rel err {rel:.2e}"

    @pytest.mark.slow
    def test_sharded_refinement_matches_single_device(self, key, mesh):
        """A sharded f32 KRR solve with f64_refine_rounds=2 must reach the
        same f64-grade solution as the single-device refinement (VERDICT
        r4 item 2 'done' criterion)."""
        from rlaopt_tpu.kernels import RBFLinOp

        n, d, k = 260, 4, 2
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        B = jax.random.normal(kb, (n, k), dtype=jnp.float32)
        reg = 1e-3
        cfg = KernelConfig(lengthscale=float(d) ** 0.5)
        pcg = PCGConfig(
            max_iters=200, rtol=1e-6,
            precond_config=NystromConfig(rank=64, rho=reg),
        )
        sols = {}
        for name, A in (
            ("sharded", ShardedRBFLinOp(X, X, cfg, mesh=mesh)),
            ("single", RBFLinOp(X, X, cfg)),
        ):
            sys_ = LinSys(A, B, reg=reg)
            W64, log = sys_.solve(
                pcg, jnp.zeros_like(B), key=key,
                f64_refine_rounds=2, f64_refine_device="accel",
            )
            sols[name] = np.asarray(W64)
            hist = log["f64_refine"]["rel_res_f64"]
            assert max(hist[-1]) < 1e-6, (name, hist)
        diff = np.linalg.norm(sols["sharded"] - sols["single"])
        scale = np.linalg.norm(sols["single"])
        assert diff / scale < 1e-6, diff / scale
