"""Multi-host / 2-D mesh tests.

Two layers, mirroring the reference's multi-device-without-a-cluster strategy
(SURVEY §4.4) extended to multi-process:

* single-process: the 8 virtual CPU devices arranged as a 2×4 ("dcn", "i")
  mesh exercise the 2-D sharding/collective semantics (psum over both axes,
  hierarchical ring) without any process boundary;
* multi-process: 2 real OS processes × 4 virtual devices each, joined via
  ``jax.distributed`` with Gloo collectives standing in for DCN, run the
  full sharded solve (the analog of the reference's NCCL prototype,
  ``experiments/distributed_matvec_v4.py:30-46``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.kernels import KernelConfig, ShardedRBFLinOp
from rlaopt_tpu.linops import ShardedLinOp
from rlaopt_tpu.models import LinSys
from rlaopt_tpu.parallel import axis_size, make_mesh_2d
from rlaopt_tpu.preconditioners import NystromConfig
from rlaopt_tpu.solvers import PCGConfig

from ..kernels.utils import compute_kernel_matrix


AXES = ("dcn", "i")


@pytest.fixture(scope="module")
def mesh2d():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh_2d(n_dcn=2, n_ici=4)


class TestMesh2D:
    def test_shape_and_axis_size(self, mesh2d):
        assert mesh2d.shape["dcn"] == 2 and mesh2d.shape["i"] == 4
        assert axis_size(mesh2d, AXES) == 8
        assert axis_size(mesh2d, "i") == 4

    def test_sharded_dense_linop_2d(self, key, dtype, tol, mesh2d):
        n, m = 61, 37  # ragged on purpose
        M = jax.random.normal(key, (n, m), dtype=dtype)
        A = ShardedLinOp.from_dense(M, mesh2d, mode="row", axis=AXES)
        x = jnp.linspace(-1, 1, m).astype(dtype)
        y = jnp.linspace(1, -1, n).astype(dtype)
        rt = 100 * tol
        assert np.allclose(A @ x, M @ x, rtol=rt, atol=rt)
        assert np.allclose(y @ A, y @ M, rtol=rt, atol=rt)
        At = A.T
        assert np.allclose(At @ y, M.T @ y, rtol=rt, atol=rt)

    @pytest.mark.parametrize("memory_mode", ["replicated", "ring"])
    def test_sharded_kernel_2d(self, key, dtype, tol, mesh2d, memory_mode):
        n, m, d = 41, 29, 4
        k1, k2 = jax.random.split(key)
        X1 = jax.random.normal(k1, (n, d), dtype=dtype)
        X2 = jax.random.normal(k2, (m, d), dtype=dtype)
        cfg = KernelConfig(const_scaling=1.5, lengthscale=0.8)
        A = ShardedRBFLinOp(
            X1, X2, cfg, mesh=mesh2d, axis=AXES, memory_mode=memory_mode
        )
        K = compute_kernel_matrix("rbf", X1, X2, 0.8, const_scaling=1.5)
        rt = 1e3 * tol
        v = jnp.asarray(np.linspace(-1, 1, m), dtype)
        y = jnp.ones((n,), dtype)
        assert np.allclose(A @ v, K @ np.asarray(v), rtol=rt, atol=rt)
        assert np.allclose(y @ A, np.asarray(y) @ K, rtol=rt, atol=rt)

    def test_oracles_2d(self, key, dtype, tol, mesh2d):
        n, d = 33, 3
        X = jax.random.normal(key, (n, d), dtype=dtype)
        cfg = KernelConfig(lengthscale=1.1)
        A = ShardedRBFLinOp(X, X, cfg, mesh=mesh2d, axis=AXES)
        K = compute_kernel_matrix("rbf", X, X, 1.1)
        blk = jnp.asarray([2, 7, 11, 30])
        rt = 1e3 * tol
        w = jnp.ones((n,), dtype)
        assert np.allclose(
            A.row_oracle(blk) @ w, K[np.asarray(blk)] @ np.asarray(w),
            rtol=rt, atol=rt,
        )
        vb = jnp.ones((4,), dtype)
        assert np.allclose(
            A.blk_oracle(blk) @ vb,
            K[np.ix_(np.asarray(blk), np.asarray(blk))] @ np.asarray(vb),
            rtol=rt, atol=rt,
        )

    def test_pcg_solve_2d(self, key, mesh2d):
        n, k = 48, 2
        dtype = jnp.float32
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, 3), dtype=dtype)
        B = jax.random.normal(kb, (n, k), dtype=dtype)
        reg = 1e-2
        A = ShardedRBFLinOp(X, X, KernelConfig(lengthscale=1.0), mesh=mesh2d, axis=AXES)
        W, log = LinSys(A, B, reg=reg).solve(
            PCGConfig(max_iters=40, rtol=1e-6,
                      precond_config=NystromConfig(rank=16, rho=reg)),
            jnp.zeros_like(B), callback_freq=10, key=key,
        )
        rel = float(
            jnp.max(log[max(log)]["metrics"]["internal_metrics"]["rel_res"])
        )
        assert rel < 1e-5


@pytest.mark.slow
def test_initialize_multihost_single_process_fallback():
    # No cluster env + no explicit args: degrade to single-process with a
    # warning instead of surfacing jax's "coordinator_address should be
    # defined" ValueError (the documented pod script must also run on a
    # plain host). jax raises before touching global state, so this is
    # safe to call in-process.
    from rlaopt_tpu.parallel import initialize_multihost

    if jax.process_count() > 1:
        pytest.skip("already in a multi-process runtime")
    with pytest.warns(UserWarning, match="single-process"):
        initialize_multihost()
    # Explicit multi-process misconfiguration still raises (ValueError for a
    # missing coordinator, or RuntimeError when the XLA backend was already
    # initialized by an earlier test — order-dependent, both must surface).
    with pytest.raises((ValueError, RuntimeError)):
        initialize_multihost(num_processes=2, process_id=0)


@pytest.mark.slow
def test_multiprocess_dryrun():
    """2 OS processes × 4 virtual devices: the real jax.distributed path."""
    from rlaopt_tpu.parallel import run_multiprocess_dryrun

    run_multiprocess_dryrun(n_procs=2, n_local=4)
