"""Triangle (symmetric-Gram) kernel matvec vs the general Pallas kernel.

The symmetric path visits only ~half the Gram tiles, serving both
K_ij @ v_j -> out[i] and K_ij^T @ v_i -> out[j] from each superdiagonal
tile; diagonal tiles are full and not mirrored. It must agree with the
general kernel AT THE SAME accuracy tier (same tile formulas, same f32
contractions) for every dot-path kernel family, tier, and tile-grid
parity (odd nt, even nt — the even case has a double-covered pairing
column that is active for half the rows only). Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import pytest

from rlaopt_tpu.ops.kernel_pallas import (
    kernel_matmat_pallas,
    kernel_matvec_symmetric,
    kernel_symmetric_supported,
)


KEY = jax.random.PRNGKey(7)

# (n, tile) chosen to exercise nt in {1, 2, 3, 4, 5} incl. ragged padding
CASES = [
    (300, 256, "rbf", None),  # nt=2 even, padded rows
    (700, 256, "rbf", "bf16x3"),  # nt=3 odd
    (1024, 256, "matern12", "bf16x3"),  # nt=4 even, exact fit
    (1200, 256, "matern32", None),  # nt=5 odd
    (200, 256, "matern52", "bfloat16"),  # nt=1 (diagonal only)
    (700, 256, "laplace", None),  # VPU feature-loop body, nt=3 odd
    (1024, 256, "laplace", None),  # nt=4 even
]


@pytest.mark.parametrize("n,tile,kind,cd", CASES)
def test_symmetric_matches_general_same_tier(n, tile, kind, cd):
    d = 20
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(KEY, 1), (n,), jnp.float32)
    ref = kernel_matmat_pallas(
        kind, X, X, v, 2.1, 1.3, compute_dtype=cd, interpret=True
    )
    got = kernel_matvec_symmetric(
        kind, X, v, 2.1, 1.3, compute_dtype=cd, tile=tile, interpret=True
    )
    assert got.shape == ref.shape
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, (n, tile, kind, cd, rel)


@pytest.mark.parametrize("k", [1, 2, 5, 8])
@pytest.mark.parametrize("cd", [None, "bf16x3"])
def test_symmetric_multi_rhs_matches_general(k, cd):
    """k <= 8 RHS columns: each owns a row of the mirror window; parity
    with the general kernel at the same tier, both grid parities."""
    for n in (300, 700):  # nt=2 even (padded), nt=3 odd
        d = 9
        X = jax.random.normal(KEY, (n, d), jnp.float32)
        V = jax.random.normal(jax.random.fold_in(KEY, 2), (n, k), jnp.float32)
        got = kernel_matvec_symmetric(
            "rbf", X, V, 1.0, 1.0, compute_dtype=cd, tile=256, interpret=True
        )
        assert got.shape == (n, k)
        ref = kernel_matmat_pallas(
            "rbf", X, X, V, 1.0, 1.0, compute_dtype=cd, interpret=True
        )
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 3e-6, (n, k, cd, rel)


def test_supported_predicate():
    # eligible: k=1, dot kernel, small d, n within the mirror-window budget
    assert kernel_symmetric_supported(10**6, 28, 1, "rbf", "bf16x3")
    assert kernel_symmetric_supported(10**6, 28, 1, "rbf", None)
    # laplace: feature-blocked body, any d (k=1 only)
    assert kernel_symmetric_supported(10**6, 512, 1, "laplace", None)
    assert not kernel_symmetric_supported(10**5, 512, 2, "laplace", None)
    # multi-column RHS within the window budget (4*n*k bytes <= 6 MB)
    assert kernel_symmetric_supported(10**5, 28, 8, "rbf", None)
    assert not kernel_symmetric_supported(10**5, 28, 9, "rbf", None)  # k > 8
    # k=2 at n=1M: the window (8 MB) exceeds the budget -> general kernel
    assert not kernel_symmetric_supported(10**6, 28, 2, "rbf", "bf16x3")
    # compensated, huge depth, huge n: all fall back to the general kernel
    assert not kernel_symmetric_supported(
        10**6, 28, 1, "rbf", None, compensated=True
    )
    assert not kernel_symmetric_supported(10**6, 512, 1, "rbf", None)
    assert not kernel_symmetric_supported(4 * 10**6, 28, 1, "rbf", None)
