"""Mesh-sharded dense matvec (analog of ``experiments/distributed_matvec_v*.py``).

The reference prototypes CUDA streams / mp.Pool / torch.distributed; here the
whole exercise is three lines: shard the matrix, annotate, apply.
"""

import os
import sys

# Runnable straight from a source checkout: `python examples/<name>.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rlaopt_tpu.linops import ShardedLinOp
from rlaopt_tpu.parallel import make_mesh


def main(n=120_000, m=100_000):
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    # Row-sharded dense operator (reference scale: 120k x 100k fp32)
    M = jax.random.normal(key, (n, m), dtype=jnp.float32)
    A = ShardedLinOp.from_dense(M, mesh, mode="row")
    x = jnp.ones((m,), dtype=jnp.float32)
    y = A @ x
    print("devices:", len(mesh.devices.flatten()), "out:", y.shape, float(y[0]))
    # transpose (COLUMN mode) reuses the same shards — metadata only
    z = A.T @ y
    print("A.T @ y:", z.shape, float(z[0]))


if __name__ == "__main__":
    main(12_000, 10_000)  # sized down for the default single-host run
