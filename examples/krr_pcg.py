"""Kernel ridge regression with Nyström-preconditioned PCG.

Analog of the reference's ``experiments/distributed_krr_linsys_solve_test.py``
workload (n=100k, Nyström rank 100), single-controller TPU style: swap
``RBFLinOp`` for ``ShardedRBFLinOp(..., mesh=make_mesh())`` to run the same
script on a pod slice.
"""

import os
import sys

# Runnable straight from a source checkout: `python examples/<name>.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
from rlaopt_tpu.models import LinSys
from rlaopt_tpu.preconditioners import NystromConfig
from rlaopt_tpu.solvers import PCGConfig


def main(n=100_000, d=100, rank=100):
    key = jax.random.PRNGKey(0)
    kx, kw, kn = jax.random.split(key, 3)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    w = jax.random.normal(kw, (d,), dtype=jnp.float32)
    y = X @ w / d**0.5 + 0.1 * jax.random.normal(kn, (n,), dtype=jnp.float32)

    reg = 1e-6 * n
    K = RBFLinOp(X, X, KernelConfig(lengthscale=float(d) ** 0.5))
    model = LinSys(K, y, reg=float(reg))
    W, log = model.solve(
        PCGConfig(
            max_iters=60, atol=0.0, rtol=1e-6,
            precond_config=NystromConfig(rank=rank, rho=float(reg)),
        ),
        jnp.zeros((n, 1), dtype=jnp.float32),
        callback_freq=10,
        key=key,
    )
    for i in sorted(log):
        rel = float(jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"]))
        print(f"iter {i:4d}  rel_res {rel:.3e}  cum_time {log[i]['cum_time']:.2f}s")


if __name__ == "__main__":
    main()
