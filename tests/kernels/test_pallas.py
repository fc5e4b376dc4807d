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
    """d > 32 exercises the MXU dot path (cross term on the MXU, norm
    vectors streamed separately) for the exact and bf16x3 tiers."""
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


@pytest.mark.parametrize("compensated", [False, True])
def test_pallas_laplace_large_d(key, compensated):
    """Laplace beyond the old d<=64 cap: the feature-blocked grid axis."""
    n, m, d = 40, 33, 100
    X1 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (m, d), dtype=jnp.float32)
    V = jax.random.normal(jax.random.fold_in(key, 2), (m, 2), jnp.float32)
    K = compute_kernel_matrix("laplace", X1, X2, 1.7, const_scaling=0.9)
    out = kernel_matmat_pallas(
        "laplace", X1, X2, V, 1.7, 0.9, tile_m=16, tile_n=128,
        interpret=True, compensated=compensated,
    )
    got = out[0] + out[1] if compensated else out
    assert np.allclose(got, K @ np.asarray(V), atol=1e-4)


def test_select_tiles_vmem_budget():
    """Tile autotuner: stays within budget, shrinks for big d, aligns to MXU."""
    from rlaopt_tpu.ops.kernel_pallas import _VMEM_BUDGET_BYTES, select_tiles

    for d_p in (128, 256, 512, 2048, 4096):
        tm, tn = select_tiles(16384, 16384, d_p, 8, "rbf", None)
        assert tm % 8 == 0 and tn % 128 == 0
        work = (
            2 * (tm * d_p * 4 + d_p * tn * 4 + tn * 8 * 4 + 2 * tm * 8 * 4)
            + 3 * tm * tn * 4
            + 2 * tm * 8 * 4
        )
        assert work <= _VMEM_BUDGET_BYTES
    # small problems clamp tiles instead of padding to a huge block
    tm, tn = select_tiles(70, 53, 128, 8, "rbf", None)
    assert tm <= 72 and tn <= 128


def test_pallas_compensated_accumulation(key):
    """Compensated (hi, lo) output: hi + lo tracks the f64 sum beyond the
    plain f32 accumulation floor across many column tiles."""
    n, m, d, k = 16, 4096, 4, 2
    X1 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (m, d), dtype=jnp.float32)
    V = jax.random.normal(jax.random.fold_in(key, 2), (m, k), dtype=jnp.float32)

    K64 = compute_kernel_matrix("rbf", X1, X2, 1.0)  # float64 oracle
    ref = K64 @ np.asarray(V, np.float64)

    hi, lo = kernel_matmat_pallas(
        "rbf", X1, X2, V, 1.0, 1.0, tile_m=16, tile_n=128,
        interpret=True, compensated=True,
    )
    plain = kernel_matmat_pallas(
        "rbf", X1, X2, V, 1.0, 1.0, tile_m=16, tile_n=128, interpret=True
    )
    comp = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    err_comp = np.abs(comp - ref).max() / np.abs(ref).max()
    err_plain = np.abs(np.asarray(plain, np.float64) - ref).max() / np.abs(ref).max()
    assert err_comp <= err_plain
    assert err_comp < 2e-7
    # the tiers must agree to f32 rounding
    assert np.allclose(hi, plain, rtol=1e-5, atol=1e-5)


def test_pallas_compensated_rejects_lossy_tier(key):
    X = jax.random.normal(key, (8, 3), dtype=jnp.float32)
    v = jnp.ones((8,), jnp.float32)
    with pytest.raises(ValueError):
        kernel_matmat_pallas(
            "rbf", X, X, v, 1.0, compute_dtype="bfloat16", compensated=True
        )


def test_linsys_compensated_metric_matches_plain(key):
    """LinSys residual metric via the compensated path stays consistent."""
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys

    n, d = 64, 3
    X = jax.random.normal(key, (n, d), dtype=jnp.float32)
    B = jax.random.normal(jax.random.fold_in(key, 1), (n, 2), jnp.float32)
    K = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
    sys_ = LinSys(K, B, reg=1e-3)
    W = jax.random.normal(jax.random.fold_in(key, 2), (n, 2), jnp.float32)
    m1 = sys_._compute_internal_metrics(W)
    # reference: plain residual in f64
    K64 = compute_kernel_matrix("rbf", X, X, 1.0)
    R = np.asarray(B, np.float64) - (
        K64 @ np.asarray(W, np.float64) + 1e-3 * np.asarray(W, np.float64)
    )
    ref_abs = np.linalg.norm(R, axis=0)
    assert np.allclose(np.asarray(m1["abs_res"]), ref_abs, rtol=1e-4)


def test_pallas_bf16_fast_path(data):
    X1, X2, V = data
    K = compute_kernel_matrix("rbf", X1, X2, 1.0)
    got = kernel_matmat_pallas(
        "rbf", X1, X2, V, 1.0, 1.0, tile_m=32, tile_n=32,
        compute_dtype="bfloat16", interpret=True,
    )
    # bf16 cross-term: looser tolerance
    assert np.allclose(got, K @ np.asarray(V), atol=5e-2)


@pytest.mark.parametrize("kind", ["rbf", "matern32"])
@pytest.mark.parametrize("cd", [None, "bf16x3", "bfloat16"])
def test_pallas_pipeline_matches_plain(key, kind, cd):
    """The software-pipelined bodies (epilogue of tile j-1 overlapped with
    the MXU cross of tile j) must be arithmetically identical to the plain
    bodies: same per-tile math, same accumulation order — only the schedule
    differs. Multi-row AND multi-column grids exercise the scratch carry,
    the j==0 warm-up, and the row-transition reset."""
    n, m, d = 80, 300, 40
    X1 = jax.random.normal(key, (n, d), dtype=jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (m, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(key, 2), (m, 3), jnp.float32)
    kw = dict(tile_m=16, tile_n=128, compute_dtype=cd, interpret=True)
    piped = kernel_matmat_pallas(kind, X1, X2, V, 2.0, 1.1, pipeline=True, **kw)
    plain = kernel_matmat_pallas(kind, X1, X2, V, 2.0, 1.1, pipeline=False, **kw)
    assert np.allclose(piped, plain, rtol=1e-6, atol=1e-6)


def test_pallas_bf16x3_tier(data):
    X1, X2, V = data
    K = compute_kernel_matrix("rbf", X1, X2, 1.0)
    got = kernel_matmat_pallas(
        "rbf", X1, X2, V, 1.0, 1.0, tile_m=32, tile_n=32,
        compute_dtype="bf16x3", interpret=True,
    )
    # near-f32: much tighter than the bf16 tier
    assert np.allclose(got, K @ np.asarray(V), atol=5e-4)
