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


@pytest.mark.parametrize("kind", ["rbf", "matern32", "matern52"])
@pytest.mark.parametrize("cd", [None, "bf16x3"])
def test_pallas_dot_path_large_d(key, kind, cd):
    """d > 32 exercises the augmented-contraction MXU path (norms folded
    into the dot as extra feature columns) for the exact and bf16x3 tiers."""
    n, m, d = 48, 37, 40
    X1 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (m, d), dtype=jnp.float32)
    V = jax.random.normal(jax.random.fold_in(key, 2), (m, 2), dtype=jnp.float32)
    K = compute_kernel_matrix(kind, X1, X2, 2.0, const_scaling=1.1)
    got = kernel_matmat_pallas(
        kind, X1, X2, V, 2.0, 1.1, tile_m=16, tile_n=128,
        compute_dtype=cd, interpret=True,
    )
    tol = 1e-4 if cd is None else 5e-4
    assert np.allclose(got, K @ np.asarray(V), atol=tol)


def test_select_tiles_vmem_budget():
    """Tile autotuner: stays within budget, shrinks for big d, aligns to MXU."""
    from rlaopt_tpu.ops.kernel_pallas import _VMEM_BUDGET_BYTES, select_tiles

    for d_p in (128, 256, 512, 2048, 4096):
        tm, tn = select_tiles(16384, 16384, d_p, 8, "rbf", None)
        assert tm % 8 == 0 and tn % 128 == 0
        work = (
            2 * (tm * d_p * 4 + d_p * tn * 4 + tn * 8 * 4 + tm * 8 * 4)
            + 2 * tm * tn * 4
            + tm * 8 * 4
        )
        assert work <= _VMEM_BUDGET_BYTES
    # small problems clamp tiles instead of padding to a huge block
    tm, tn = select_tiles(70, 53, 128, 8, "rbf", None)
    assert tm <= 72 and tn <= 128


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
