"""Multi-process dryrun worker (see ``run_multiprocess_dryrun``).

Run as ``python -m rlaopt_tpu.parallel._multihost_dryrun <proc_id> <nproc>
<port>`` with ``XLA_FLAGS=--xla_force_host_platform_device_count=K`` — each
process contributes K virtual CPU devices to a (nproc, K) 2-D mesh and the
full sharded stack (Gram matvec + Nyström-PCG training step) runs across the
process boundary with Gloo collectives standing in for DCN.
"""

import sys


def main(proc_id: int, nproc: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Join the process group BEFORE importing rlaopt_tpu: the package's
    # module RNG touches the backend at import, and jax.distributed must
    # initialize first.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )

    from rlaopt_tpu.parallel.distributed import make_mesh_2d

    import jax.numpy as jnp

    from rlaopt_tpu.kernels import KernelConfig, ShardedRBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig, SAPConfig

    n_local = len(jax.local_devices())
    mesh = make_mesh_2d(n_dcn=nproc, n_ici=n_local)
    axes = ("dcn", "i")

    key = jax.random.PRNGKey(0)
    n, d, k = 8 * nproc * n_local, 3, 2
    dtype = jnp.float32
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=dtype)
    B = jax.random.normal(kb, (n, k), dtype=dtype)
    reg = 1e-2

    # Dense reference (replicated computation — every process agrees).
    K_dense = jnp.exp(
        -0.5 * jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    )
    v = jnp.ones((n,), dtype=dtype)
    ref_mv = K_dense @ v

    def check(a, b, what, tol=1e-4):
        err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        if err > tol:
            raise AssertionError(f"{what}: rel err {err:.2e} > {tol}")

    # Replicated-memory sharded operator over the 2-D (dcn, ici) mesh.
    A = ShardedRBFLinOp(
        X, X, KernelConfig(lengthscale=1.0), mesh=mesh, axis=axes
    )
    check(A @ v, ref_mv, "2-D sharded matvec")
    check(v @ A, ref_mv, "2-D sharded adjoint (psum over dcn+ici)")

    # Ring mode: per-step rotation on the ICI axis, one DCN shift per cycle.
    A_ring = ShardedRBFLinOp(
        X, X, KernelConfig(lengthscale=1.0), mesh=mesh, axis=axes,
        memory_mode="ring",
    )
    check(A_ring @ v, ref_mv, "2-D hierarchical ring matvec")
    check(A_ring.T @ v, ref_mv, "2-D hierarchical ring adjoint")

    # Full PCG training step across the process boundary.
    W, _ = LinSys(A, B, reg=reg).solve(
        PCGConfig(
            max_iters=1, rtol=1e-12,
            precond_config=NystromConfig(rank=4, rho=reg),
        ),
        jnp.zeros_like(B),
        callback_freq=1,
        key=key,
    )
    assert bool(jnp.all(jnp.isfinite(W)))

    # SAP training step (distributed row/blk oracles rebound to the payload
    # passed as a jit argument — the multi-host-safe path).
    sys_sap = LinSys(
        A, B, reg=reg, A_row_oracle=A.row_oracle, A_blk_oracle=A.blk_oracle
    )
    W2, _ = sys_sap.solve(
        SAPConfig(
            max_iters=1, rtol=1e-12, blk_sz=4, accel=False,
            precond_config=NystromConfig(rank=4, rho=reg),
        ),
        jnp.zeros_like(B),
        callback_freq=1,
        key=key,
    )
    assert bool(jnp.all(jnp.isfinite(W2)))
    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
