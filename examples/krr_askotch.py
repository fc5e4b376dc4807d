"""ASkotch: accelerated randomized block-coordinate KRR at scale.

Analog of ``experiments/distributed_krr_linsys_askotch_solve_test.py``
(n=10M, d=50, k=10 RHS, blk=n/100, Nyström rank 100 in the reference; sized
here for one chip — scale n up and pass a mesh on a pod slice).
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
from rlaopt_tpu.solvers import SAPAccelConfig, SAPConfig


def main(n=1_000_000, d=50, k=10):
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32) / d**0.5
    B = jax.random.normal(kb, (n, k), dtype=jnp.float32)

    reg = 1e-2
    blk_sz = n // 100
    K = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
    model = LinSys(
        K, B, reg=float(reg),
        A_row_oracle=K.row_oracle, A_blk_oracle=K.blk_oracle,
    )
    W, log = model.solve(
        SAPConfig(
            max_iters=300, rtol=1e-6, blk_sz=blk_sz,
            precond_config=NystromConfig(rank=100, rho=float(reg)),
            accel=True,
            accel_config=SAPAccelConfig(mu=float(reg), nu=100.0),
            power_iters=10,
        ),
        jnp.zeros((n, k), dtype=jnp.float32),
        callback_freq=25,
        key=key,
    )
    for i in sorted(log):
        rel = float(jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"]))
        print(f"iter {i:4d}  rel_res {rel:.3e}  cum_time {log[i]['cum_time']:.2f}s")


if __name__ == "__main__":
    main()
