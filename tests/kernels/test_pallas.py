"""Pallas fused kernel matvec vs naive oracle (interpret mode on CPU).

On real TPU the same kernel is exercised by bench.py and the verify drive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.kernels import KERNEL_KINDS
from rlaopt_tpu.ops.kernel_pallas import kernel_matmat_pallas

from .utils import compute_kernel_matrix


@pytest.fixture
def data(key):
    n, m, d = 70, 53, 5
    X1 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (m, d), dtype=jnp.float32)
    V = jax.random.normal(jax.random.fold_in(key, 2), (m, 3), dtype=jnp.float32)
    return X1, X2, V


@pytest.mark.parametrize("kind", KERNEL_KINDS)
def test_pallas_matches_oracle(data, kind):
    X1, X2, V = data
    K = compute_kernel_matrix(kind, X1, X2, 1.3, const_scaling=2.0)
    got = kernel_matmat_pallas(
        kind, X1, X2, V, 1.3, 2.0, tile_m=32, tile_n=32, interpret=True
    )
    assert np.allclose(got, K @ np.asarray(V), atol=1e-4)


def test_pallas_ard_and_vector(data, key):
    X1, X2, V = data
    d = X1.shape[1]
    ls = np.linspace(0.5, 2.0, d)
    K = compute_kernel_matrix("rbf", X1, X2, ls)
    got = kernel_matmat_pallas(
        "rbf", X1, X2, V[:, 0], jnp.asarray(ls, jnp.float32), 1.0,
        tile_m=32, tile_n=32, interpret=True,
    )
    assert got.shape == (X1.shape[0],)
    assert np.allclose(got, K @ np.asarray(V[:, 0]), atol=1e-4)


def test_pallas_bf16_fast_path(data):
    X1, X2, V = data
    K = compute_kernel_matrix("rbf", X1, X2, 1.0)
    got = kernel_matmat_pallas(
        "rbf", X1, X2, V, 1.0, 1.0, tile_m=32, tile_n=32,
        compute_dtype="bfloat16", interpret=True,
    )
    # bf16 cross-term: looser tolerance
    assert np.allclose(got, K @ np.asarray(V), atol=5e-2)


def test_pallas_bf16x3_tier(data):
    X1, X2, V = data
    K = compute_kernel_matrix("rbf", X1, X2, 1.0)
    got = kernel_matmat_pallas(
        "rbf", X1, X2, V, 1.0, 1.0, tile_m=32, tile_n=32,
        compute_dtype="bf16x3", interpret=True,
    )
    # near-f32: much tighter than the bf16 tier
    assert np.allclose(got, K @ np.asarray(V), atol=5e-4)
