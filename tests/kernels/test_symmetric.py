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
    kernel_matmat_symmetric_banded,
    kernel_matvec_symmetric,
    kernel_pair_matmat,
    kernel_symmetric_banded_supported,
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


@pytest.mark.parametrize("kind", ["matern12", "matern52"])
def test_symmetric_multi_rhs_matern(kind):
    """Multi-RHS triangle kernel on the matern tile formulas (the sqrt
    epilogue differs from rbf's exp)."""
    n, d, k = 700, 11, 4
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(KEY, 3), (n, k), jnp.float32)
    got = kernel_matvec_symmetric(
        kind, X, V, 1.7, 1.0, tile=256, interpret=True
    )
    ref = kernel_matmat_pallas(kind, X, X, V, 1.7, 1.0, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, (kind, rel)


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


@pytest.mark.parametrize("k", [10, 16])
@pytest.mark.parametrize("cd", [None, "bf16x3", "bfloat16"])
def test_symmetric_k_to_16_matches_general(k, cd):
    """Round-4 extension (VERDICT r3 item 2): the reference's headline
    workload is k=10 RHS
    (/root/reference/experiments/distributed_krr_linsys_askotch_solve_test.py:26-31);
    all dot-path tiers now mirror through k=16 — the exact tier via the
    6-pass MXU contraction ("highest"), k_pad=16 window rows."""
    for n in (300, 700):  # even (padded) and odd tile grids
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
        # mirror rows go through the tier-matched MXU contraction: the
        # exact tier's 6-pass split truncates at ~2^-24 (f32-grade); the
        # bfloat16 tier re-rounds to bf16 on those rows (~2e-3, within
        # that tier's own ~1e-2 value error)
        tol = {None: 3e-6, "bf16x3": 8e-6, "bfloat16": 4e-3}[cd]
        assert rel < tol, (n, k, cd, rel)


def test_pair_kernel_k10_exact_tier():
    """Pair kernel at the reference headline k=10, exact tier (the
    banded driver's building block past the single-window n)."""
    n1, n2, d, k = 512, 260, 9, 10
    X1 = jax.random.normal(KEY, (n1, d), jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(KEY, 1), (n2, d), jnp.float32)
    V2 = jax.random.normal(jax.random.fold_in(KEY, 2), (n2, k), jnp.float32)
    V1 = jax.random.normal(jax.random.fold_in(KEY, 3), (n1, k), jnp.float32)
    o1, o2 = kernel_pair_matmat(
        "rbf", X1, X2, V2, V1, 1.4, 1.2, tile=256, interpret=True
    )
    r1 = kernel_matmat_pallas("rbf", X1, X2, V2, 1.4, 1.2, interpret=True)
    r2 = kernel_matmat_pallas("rbf", X2, X1, V1, 1.4, 1.2, interpret=True)
    for got, ref in ((o1, r1), (o2, r2)):
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 3e-6, rel


def test_banded_symmetric_k10_exact_tier():
    """Banded driver at k=10 on the exact tier (triangle diagonals +
    pair off-diagonals, both through the "highest" MXU mirror)."""
    n, d, k = 900, 9, 10
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(KEY, 5), (n, k), jnp.float32)
    got = kernel_matmat_symmetric_banded(
        "rbf", X, V, 1.4, 1.1, tile=256, interpret=True, band_rows=512
    )
    ref = kernel_matmat_pallas("rbf", X, X, V, 1.4, 1.1, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, rel


def test_symmetric_laplace_multi_rhs():
    """Laplace triangle kernel with k > 1: each RHS column owns rows of
    the mirror window (MXU 6-pass mirror mode at these sizes; k ≤ 16
    since round 4 — the window is round_up(k, 8) rows per tile)."""
    for n, k in ((300, 2), (700, 5), (700, 8), (700, 12)):
        d = 20
        X = jax.random.normal(KEY, (n, d), jnp.float32)
        V = jax.random.normal(jax.random.fold_in(KEY, 4), (n, k), jnp.float32)
        got = kernel_matvec_symmetric(
            "laplace", X, V, 1.9, 1.2, tile=256, interpret=True
        )
        assert got.shape == (n, k)
        ref = kernel_matmat_pallas(
            "laplace", X, X, V, 1.9, 1.2, interpret=True
        )
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 3e-6, (n, k, rel)


def test_symmetric_laplace_vpu_mirror_mode():
    """The VPU sublane-reduce mirror (the single-window mode past the
    MXU window's ~1.3M-row reach, k <= 2) — forced at small n so the
    interpret test covers both engines."""
    from rlaopt_tpu.ops.kernel_pallas import (
        _laplace_matvec_symmetric,
        _laplace_pair_matmat,
        scale_inputs,
    )

    n, d, k = 700, 20, 2
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(KEY, 7), (n, k), jnp.float32)
    Xs = scale_inputs(X, 1.9)
    got = _laplace_matvec_symmetric(Xs, V, 256, True, force_mode="vpu")[:n]
    ref = kernel_matmat_pallas("laplace", X, X, V, 1.9, 1.0, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, rel

    m = 260
    Y = jax.random.normal(jax.random.fold_in(KEY, 8), (m, d), jnp.float32)
    Vy = jax.random.normal(jax.random.fold_in(KEY, 9), (m, k), jnp.float32)
    Ys = scale_inputs(Y, 1.9)
    o1, o2 = _laplace_pair_matmat(Xs, Ys, Vy, V, 256, True, force_mode="vpu")
    r1 = kernel_matmat_pallas("laplace", X, Y, Vy, 1.9, 1.0, interpret=True)
    r2 = kernel_matmat_pallas("laplace", Y, X, V, 1.9, 1.0, interpret=True)
    assert float(jnp.linalg.norm(o1[:n] - r1) / jnp.linalg.norm(r1)) < 3e-6
    assert float(jnp.linalg.norm(o2[:m] - r2) / jnp.linalg.norm(r2)) < 3e-6


@pytest.mark.parametrize("n1,n2,k", [(300, 500, 1), (512, 260, 3)])
def test_pair_kernel_laplace(n1, n2, k):
    """Laplace pair body: one L1/exp materialization serving both
    products == two general Laplace kernels (exact f32)."""
    d = 20  # two feature blocks at fb=16 exercises the 3-D x layout
    X1 = jax.random.normal(KEY, (n1, d), jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(KEY, 1), (n2, d), jnp.float32)
    V2 = jax.random.normal(jax.random.fold_in(KEY, 2), (n2, k), jnp.float32)
    V1 = jax.random.normal(jax.random.fold_in(KEY, 3), (n1, k), jnp.float32)
    o1, o2 = kernel_pair_matmat(
        "laplace", X1, X2, V2, V1, 1.4, 1.2, tile=256, interpret=True
    )
    r1 = kernel_matmat_pallas("laplace", X1, X2, V2, 1.4, 1.2, interpret=True)
    r2 = kernel_matmat_pallas("laplace", X2, X1, V1, 1.4, 1.2, interpret=True)
    for got, ref in ((o1, r1), (o2, r2)):
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 3e-6, (n1, n2, k, rel)


@pytest.mark.parametrize("n,band,k", [(900, 512, 1), (1100, 256, 2)])
def test_banded_symmetric_laplace(n, band, k):
    """Laplace banded driver: diagonal triangles + off-diagonal VPU
    pairs == the general Laplace kernel."""
    d = 20
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(KEY, 5), (n, k), jnp.float32)
    got = kernel_matmat_symmetric_banded(
        "laplace", X, V, 1.4, 1.1, tile=256, interpret=True, band_rows=band
    )
    ref = kernel_matmat_pallas("laplace", X, X, V, 1.4, 1.1, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, (n, band, k, rel)


def test_supported_predicate():
    # eligible: k=1, dot kernel, small d, n within the mirror-window budget
    assert kernel_symmetric_supported(10**6, 28, 1, "rbf", "bf16x3")
    assert kernel_symmetric_supported(10**6, 28, 1, "rbf", None)
    # laplace: feature-blocked body, any d. MXU mirror mode (6-pass
    # split on the body's idle MXU, f32-grade) takes k <= 8 within its
    # 8-row window (n <= ~1.3M); past that the VPU sublane-reduce
    # mirror extends the single window at k <= 2 only.
    assert kernel_symmetric_supported(10**6, 512, 1, "laplace", None)
    assert kernel_symmetric_supported(10**5, 512, 2, "laplace", None)
    assert kernel_symmetric_supported(10**5, 512, 8, "laplace", None)
    assert kernel_symmetric_supported(10**5, 512, 16, "laplace", None)
    assert not kernel_symmetric_supported(10**5, 512, 17, "laplace", None)
    assert kernel_symmetric_supported(2 * 10**6, 512, 2, "laplace", None)
    assert not kernel_symmetric_supported(2 * 10**6, 512, 3, "laplace", None)
    # multi-column RHS within the depth-aware window budget: all
    # dot-path tiers take k <= 16 (k >= 3 through the tier-matched MXU
    # mirror — 6-pass "highest" on the exact tier since round 4)
    assert kernel_symmetric_supported(10**5, 28, 2, "rbf", None)
    assert kernel_symmetric_supported(10**5, 28, 3, "rbf", None)
    assert kernel_symmetric_supported(10**5, 28, 10, "rbf", None)
    assert kernel_symmetric_supported(10**5, 28, 9, "rbf", "bf16x3")
    assert kernel_symmetric_supported(10**5, 28, 16, "rbf", "bf16x3")
    assert not kernel_symmetric_supported(10**5, 28, 17, "rbf", "bf16x3")
    assert not kernel_symmetric_supported(10**5, 28, 17, "rbf", None)
    # d=28 bf16x3 is depth 128: ~36.5 MiB of window at the 64 MiB scoped
    # limit -> the full k=8 fits at n=1M; k=1 reaches n ~ 9M
    assert kernel_symmetric_supported(10**6, 28, 8, "rbf", "bf16x3")
    assert kernel_symmetric_supported(4 * 10**6, 28, 1, "rbf", None)
    # compensated, huge depth, huge n: all fall back to the general kernel
    assert not kernel_symmetric_supported(
        10**6, 28, 1, "rbf", None, compensated=True
    )
    assert not kernel_symmetric_supported(10**6, 512, 1, "rbf", None)
    assert not kernel_symmetric_supported(10**7, 28, 1, "rbf", None)


@pytest.mark.parametrize("n1,n2", [(300, 500), (512, 512), (700, 260)])
@pytest.mark.parametrize("cd", [None, "bf16x3"])
def test_pair_kernel_matches_two_general_calls(n1, n2, cd):
    """One K_IJ materialization serving both products == two general
    kernels, at the same tier; ragged and exact-tile band shapes."""
    d, k = 9, 3
    X1 = jax.random.normal(KEY, (n1, d), jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(KEY, 1), (n2, d), jnp.float32)
    V2 = jax.random.normal(jax.random.fold_in(KEY, 2), (n2, k), jnp.float32)
    V1 = jax.random.normal(jax.random.fold_in(KEY, 3), (n1, k), jnp.float32)
    o1, o2 = kernel_pair_matmat(
        "rbf", X1, X2, V2, V1, 1.4, 1.2, compute_dtype=cd, tile=256,
        interpret=True,
    )
    r1 = kernel_matmat_pallas(
        "rbf", X1, X2, V2, 1.4, 1.2, compute_dtype=cd, interpret=True
    )
    r2 = kernel_matmat_pallas(
        "rbf", X2, X1, V1, 1.4, 1.2, compute_dtype=cd, interpret=True
    )
    # bf16x3 at k=3 uses the MXU split mirror: one extra ~2^-18-grade
    # product on a tier whose own accuracy is ~2e-6
    tol = 8e-6 if cd == "bf16x3" else 3e-6
    for got, ref in ((o1, r1), (o2, r2)):
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < tol, (n1, n2, cd, rel)


@pytest.mark.parametrize("n,band", [(900, 512), (1536, 512), (1100, 256)])
@pytest.mark.parametrize("kind", ["rbf", "matern32"])
def test_banded_symmetric_matches_general(n, band, kind):
    """Multi-band driver (diagonal triangles + off-diagonal pairs) == the
    general kernel; ragged tail bands and 2-3 band counts."""
    d, k = 9, 2
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(KEY, 5), (n, k), jnp.float32)
    got = kernel_matmat_symmetric_banded(
        kind, X, V, 1.4, 1.1, tile=256, interpret=True, band_rows=band
    )
    ref = kernel_matmat_pallas(kind, X, X, V, 1.4, 1.1, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, (n, band, kind, rel)


def test_banded_symmetric_1d_rhs_and_single_band():
    n, d = 700, 9
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(KEY, 6), (n,), jnp.float32)
    got = kernel_matmat_symmetric_banded(
        "rbf", X, v, 1.4, 1.0, tile=256, interpret=True
    )
    assert got.shape == (n,)
    ref = kernel_matmat_pallas("rbf", X, X, v, 1.4, 1.0, interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6


def test_banded_supported_predicate():
    # any n the single-window predicate accepts is banded-eligible too
    assert kernel_symmetric_banded_supported(10**6, 28, 1, "rbf", "bf16x3")
    # past the single-window cap: banded takes over
    assert not kernel_symmetric_supported(10**7, 28, 1, "rbf", None)
    assert kernel_symmetric_banded_supported(10**7, 28, 1, "rbf", None)
    assert kernel_symmetric_banded_supported(10**7, 50, 1, "rbf", "bf16x3")
    assert kernel_symmetric_banded_supported(4 * 10**6, 28, 3, "rbf", "bf16x3")
    # same hard gates as the triangle kernel
    assert kernel_symmetric_banded_supported(10**6, 28, 9, "rbf", None)
    assert not kernel_symmetric_banded_supported(10**6, 28, 17, "rbf", None)
    assert not kernel_symmetric_banded_supported(10**6, 512, 1, "rbf", None)
    # laplace: banded past the flat window cap (k<=8, band-count cap)
    assert kernel_symmetric_banded_supported(10**6, 28, 1, "laplace", None)
    assert kernel_symmetric_banded_supported(2 * 10**7, 28, 1, "laplace", None)
    assert kernel_symmetric_banded_supported(10**6, 28, 3, "laplace", None)
    assert kernel_symmetric_banded_supported(10**6, 28, 9, "laplace", None)
    assert not kernel_symmetric_banded_supported(
        10**6, 28, 17, "laplace", None
    )
    # band-count cap: k=8 shrinks bands 8x; the same shape at k=1 has
    # 8x fewer bands and stays eligible.
    assert not kernel_symmetric_banded_supported(10**8, 28, 8, "rbf", "bf16x3")
    assert kernel_symmetric_banded_supported(10**8, 28, 1, "rbf", "bf16x3")


def test_mirror_exact_tier_canary_onchip():
    """On-chip accuracy canary (ADVICE r4): the exact-tier k>=3 symmetric
    mirror relies on Mosaic NOT constant-folding ``kv - f32(bf16(kv))``
    (``_mirror_dot6``); a compiler change would silently degrade it from
    ~1.5e-7 to ~2e-3 error. Compare against the general kernel with a
    1e-6 bar so a toolchain regression fails LOUDLY. Skipped off-TPU
    (interpret mode cannot exhibit the Mosaic folding)."""
    from rlaopt_tpu.ops.kernel_dispatch import _on_tpu

    if not _on_tpu():
        pytest.skip("on-chip Mosaic canary — requires a TPU backend")
    n, d, k = 4096, 28, 4
    X = jax.random.normal(KEY, (n, d), jnp.float32)
    V = jax.random.normal(jax.random.fold_in(KEY, 1), (n, k), jnp.float32)
    ls = float(d) ** 0.5
    sym = kernel_matvec_symmetric("rbf", X, V, ls, 1.0, compute_dtype=None)
    gen = kernel_matmat_pallas("rbf", X, X, V, ls, 1.0, compute_dtype=None)
    import numpy as np

    rel = float(
        np.abs(np.asarray(sym) - np.asarray(gen)).max()
        / np.abs(np.asarray(gen)).max()
    )
    assert rel < 1e-6, f"symmetric mirror degraded: rel {rel:.2e}"
