"""Multi-host sharded KRR — run one copy of this script per host/slice.

The reference's direction for multi-node execution is a collective backend
(its NCCL prototype, ``experiments/distributed_matvec_v4.py``); here the
equivalent is JAX's multi-process runtime: every process joins a coordinator,
the data is sharded over a 2-D ("dcn", "i") mesh (slices × chips), and the
same single-controller program runs everywhere — psum partial sums ride ICI
within a slice and DCN across slices.

Single-host smoke test (two terminal windows, 4 virtual CPU devices each):

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
        python examples/multihost_krr.py --procs 2 --proc-id 0 --port 9876
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
        python examples/multihost_krr.py --procs 2 --proc-id 1 --port 9876

On a TPU pod, drop the flags and the --procs/--proc-id arguments: the
runtime auto-detects them.
"""

import os
import sys

# Runnable straight from a source checkout: `python examples/<name>.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, default=None)
    p.add_argument("--proc-id", type=int, default=None)
    p.add_argument("--port", type=int, default=9876)
    p.add_argument("--coordinator", default="localhost")
    args = p.parse_args()

    # Join the process group BEFORE importing rlaopt_tpu (the package RNG
    # would otherwise initialize the backend first).
    import jax

    from rlaopt_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(
        coordinator_address=(
            f"{args.coordinator}:{args.port}" if args.procs else None
        ),
        num_processes=args.procs,
        process_id=args.proc_id,
    )

    import jax.numpy as jnp

    from rlaopt_tpu.kernels import KernelConfig, ShardedRBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.parallel import make_mesh_2d
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig

    mesh = make_mesh_2d()  # (processes/slices) × (local devices)
    axes = tuple(mesh.axis_names)
    if jax.process_index() == 0:
        print(f"mesh {dict(mesh.shape)} over {jax.process_count()} processes")

    n, d, k = 4096, 8, 2
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), jnp.float32)
    B = jax.random.normal(kb, (n, k), jnp.float32)
    reg = 1e-3 * n

    K = ShardedRBFLinOp(
        X, X, KernelConfig(lengthscale=float(d) ** 0.5), mesh=mesh, axis=axes
    )
    W, log = LinSys(K, B, reg=float(reg)).solve(
        PCGConfig(
            max_iters=50, rtol=1e-6,
            precond_config=NystromConfig(rank=64, rho=float(reg)),
        ),
        jnp.zeros_like(B),
        callback_freq=10,
        key=key,
    )
    it = max(i for i in log.keys() if isinstance(i, int))
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    if jax.process_index() == 0:
        print(f"iters={it} rel_res={rel:.2e}")


if __name__ == "__main__":
    main()
