"""SAP Nyström-rank sweep on least-squares normal equations.

Analog of the reference's ``experiments/linsys_solve_test.ipynb`` (35k×1k
least squares, SAP with per-block Nyström rank 10..100, blk_sz=100).
"""

import os
import sys

# Runnable straight from a source checkout: `python examples/<name>.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rlaopt_tpu.linops import aslinop
from rlaopt_tpu.models import LinSys
from rlaopt_tpu.preconditioners import NystromConfig
from rlaopt_tpu.solvers import SAPConfig


def main(m=35_000, n=1_000, blk_sz=100):
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    A = jax.random.normal(ka, (m, n), dtype=jnp.float32)
    A = A * jnp.logspace(0, -3, n, dtype=jnp.float32)[None, :]
    b = jax.random.normal(kb, (m,), dtype=jnp.float32)

    # normal equations: (AᵀA + reg·I) w = Aᵀ b
    G = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
    rhs = A.T @ b
    reg = 1e-4 * float(jnp.trace(G)) / n

    def row_oracle(blk):
        return aslinop(G[blk, :])

    def blk_oracle(blk):
        return aslinop(G[blk][:, blk])

    for rank in (10, 20, 50, 100):
        model = LinSys(
            G, rhs, reg=reg, A_row_oracle=row_oracle, A_blk_oracle=blk_oracle
        )
        W, log = model.solve(
            SAPConfig(
                max_iters=500, rtol=1e-6, blk_sz=blk_sz,
                precond_config=NystromConfig(rank=rank, rho=reg),
                accel=False,
            ),
            jnp.zeros((n, 1), dtype=jnp.float32),
            callback_freq=100,
            key=key,
        )
        it = max(i for i in log.keys() if isinstance(i, int))
        rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
        print(f"rank {rank:4d}: iters={it} rel_res={rel:.3e}")


if __name__ == "__main__":
    main()
