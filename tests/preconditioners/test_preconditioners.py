"""Preconditioner tests.

Ports the reference's property-test strategy (SURVEY §4 items 5-6):
mock subclass for ABC dispatch, Nyström U-orthonormality / S ≥ 0 /
reconstruction / damping behavior, Newton inverse round-trip + SPD,
SkPre small-sketch warning, factory dispatch.
"""

import jax
import jax.numpy as jnp
import pytest

from rlaopt_tpu.linops import SymmetricLinOp, aslinop
from rlaopt_tpu.preconditioners import (
    Identity,
    IdentityConfig,
    Newton,
    NewtonConfig,
    Nystrom,
    NystromConfig,
    SkPre,
    SkPreConfig,
    _get_precond,
    _is_precond_config,
)
from rlaopt_tpu.preconditioners.base import Preconditioner


def spd_matrix(key, n, dtype, cond=1e4):
    """Ill-conditioned SPD test matrix with eigenvalues log-spaced."""
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), dtype=dtype))
    eigs = jnp.logspace(0, -jnp.log10(cond), n, dtype=dtype)
    return (Q * eigs) @ Q.T


class MockPreconditioner(Preconditioner):
    """2x-scaling mock validating base-class dispatch (ref test_preconditioner.py)."""

    def _update(self, A, *args, key=None, **kwargs):
        pass

    def _matmul(self, x):
        return 2.0 * x

    def _inverse_matmul_1d(self, x):
        return 0.5 * x

    def _inverse_matmul_2d(self, x):
        return 0.5 * x


class TestBase:
    def test_matmul_dispatch_and_inv(self, dtype):
        P = MockPreconditioner(IdentityConfig())
        x = jnp.ones(4, dtype=dtype)
        X = jnp.ones((4, 2), dtype=dtype)
        assert jnp.allclose(P @ x, 2.0 * x)
        assert jnp.allclose(P @ X, 2.0 * X)
        assert jnp.allclose(P._inv @ x, 0.5 * x)
        assert jnp.allclose(P._inv @ X, 0.5 * X)

    def test_matmul_validates(self):
        P = MockPreconditioner(IdentityConfig())
        with pytest.raises(TypeError):
            P @ "nope"
        with pytest.raises(ValueError):
            P @ jnp.ones((2, 2, 2))

    def test_inverse_matmul_compose(self):
        P = MockPreconditioner(IdentityConfig())
        f = P._inverse_matmul_compose(lambda x: 4.0 * x)
        assert jnp.allclose(f(jnp.ones(3)), 2.0 * jnp.ones(3))

    def test_update_damping_noop(self):
        P = MockPreconditioner(IdentityConfig())
        P._update_damping(baseline_rho=1.0)  # must not raise


class TestIdentity:
    def test_identity(self, dtype, key):
        P = Identity(IdentityConfig())
        P._update(jnp.eye(3, dtype=dtype))
        x = jax.random.normal(key, (3,), dtype=dtype)
        assert jnp.allclose(P @ x, x)
        assert jnp.allclose(P._inv @ x, x)


class TestNewton:
    def test_inverse_roundtrip(self, dtype, tol, key):
        n = 20
        A = spd_matrix(key, n, dtype)
        P = Newton(NewtonConfig(rho=1e-3))
        P._update(A)
        x = jax.random.normal(jax.random.fold_in(key, 1), (n,), dtype=dtype)
        assert jnp.allclose(P._inv @ (P @ x), x, rtol=1e5 * tol, atol=1e5 * tol)
        X = jax.random.normal(jax.random.fold_in(key, 2), (n, 3), dtype=dtype)
        assert jnp.allclose(P._inv @ (P @ X), X, rtol=1e5 * tol, atol=1e5 * tol)

    def test_matches_shifted_matrix(self, dtype, tol, key):
        n = 10
        A = spd_matrix(key, n, dtype)
        rho = 0.5
        P = Newton(NewtonConfig(rho=rho))
        P._update(A)
        x = jnp.ones(n, dtype=dtype)
        want = (A + rho * jnp.eye(n, dtype=dtype)) @ x
        assert jnp.allclose(P @ x, want, rtol=1e3 * tol, atol=1e3 * tol)

    def test_update_from_linop_densifies(self, dtype, tol, key):
        n = 10
        A = spd_matrix(key, n, dtype)
        op = SymmetricLinOp(A.shape, matvec=lambda v: A @ v, dtype=dtype)
        P = Newton(NewtonConfig(rho=1e-2))
        P._update(op)
        P2 = Newton(NewtonConfig(rho=1e-2))
        P2._update(A)
        assert jnp.allclose(P.L, P2.L, rtol=1e3 * tol, atol=1e3 * tol)

    def test_spd(self, dtype, key):
        n = 12
        A = spd_matrix(key, n, dtype)
        P = Newton(NewtonConfig(rho=1e-2))
        P._update(A)
        Pd = P @ jnp.eye(n, dtype=dtype)
        eigs = jnp.linalg.eigvalsh((Pd + Pd.T) / 2)
        assert jnp.all(eigs > 0)


class TestNystrom:
    @pytest.mark.parametrize("sketch", ["gauss", "ortho", "sparse", "srht"])
    def test_factors(self, dtype, tol, key, sketch):
        n, rank = 50, 20
        A = spd_matrix(key, n, dtype)
        P = Nystrom(NystromConfig(rank=rank, rho=1e-4, sketch=sketch))
        P._update(A, key=jax.random.fold_in(key, 7))
        assert P.U.shape == (n, rank)
        assert P.S.shape == (rank,)
        # U orthonormal
        assert jnp.allclose(
            P.U.T @ P.U, jnp.eye(rank, dtype=dtype), atol=2e3 * tol
        )
        # S nonneg, sorted descending
        assert jnp.all(P.S >= 0)
        assert jnp.all(jnp.diff(P.S) <= 1e2 * tol)

    def test_eigh_and_svd_routes_agree(self, dtype, tol, key):
        # The tall-case Gram-eigh route (taken when n > 64·rank to avoid the
        # (n, r) SVD workspace blow-up) squares the conditioning relative to
        # the SVD path; this bounds the drift between the two factorizations
        # on the identical problem, around the switchover scale.
        from rlaopt_tpu.preconditioners.nystrom import nystrom_update

        n, rank = 96, 8  # n in the vicinity of 64·rank relative to budget
        A = spd_matrix(key, n, dtype, cond=1e6)
        f_svd = nystrom_update(
            lambda X: A @ X, n, rank, "gauss", key, dtype, _route="svd"
        )
        f_eigh = nystrom_update(
            lambda X: A @ X, n, rank, "gauss", key, dtype, _route="eigh"
        )
        # Compare the rotation-invariant reconstruction, not U itself.
        rec_svd = (f_svd.U * f_svd.S) @ f_svd.U.T
        rec_eigh = (f_eigh.U * f_eigh.S) @ f_eigh.U.T
        scale = jnp.linalg.norm(rec_svd)
        assert jnp.linalg.norm(rec_svd - rec_eigh) / scale < 1e3 * tol
        # Both routes produce orthonormal U and matching spectra.
        assert jnp.allclose(
            f_eigh.U.T @ f_eigh.U, jnp.eye(rank, dtype=dtype), atol=2e3 * tol
        )
        assert jnp.allclose(f_svd.S, f_eigh.S, rtol=1e3 * tol, atol=1e2 * tol)

    def test_rank_above_dim_clamps_to_exact(self, dtype, tol, key):
        # rank > n would sketch a rank-deficient core (and broke SAP when a
        # block was smaller than the configured Nyström rank); the update
        # clamps to rank = n, where the Nyström approximation is exact.
        from rlaopt_tpu.preconditioners.nystrom import nystrom_update

        n = 12
        A = spd_matrix(key, n, dtype, cond=1e3)
        with pytest.warns(UserWarning, match="clamping"):
            f = nystrom_update(lambda X: A @ X, n, 3 * n, "gauss", key, dtype)
        assert f.U.shape == (n, n) and f.S.shape == (n,)
        rec = (f.U * f.S) @ f.U.T
        assert jnp.linalg.norm(rec - A) / jnp.linalg.norm(A) < 1e4 * tol

    def test_reconstruction_quality(self, dtype, key):
        # Fast-decay SPD matrix: rank-r Nyström should capture it well
        n, rank = 60, 30
        A = spd_matrix(key, n, dtype, cond=1e8)
        P = Nystrom(NystromConfig(rank=rank, rho=1e-6))
        P._update(A, key=key)
        A_hat = (P.U * P.S) @ P.U.T
        rel = jnp.linalg.norm(A - A_hat) / jnp.linalg.norm(A)
        assert rel < 0.1

    def test_inverse_roundtrip(self, dtype, tol, key):
        n, rank = 40, 35
        A = spd_matrix(key, n, dtype, cond=1e3)
        P = Nystrom(NystromConfig(rank=rank, rho=1e-2, damping_mode="non_adaptive"))
        P._update(A, key=key)
        x = jax.random.normal(jax.random.fold_in(key, 3), (n,), dtype=dtype)
        y = P._inv @ (P @ x)
        # fp32 path goes through the extra-Cholesky branch; tolerate more
        assert jnp.allclose(y, x, rtol=1e4 * tol, atol=1e4 * tol)

    def test_low_precision_flag_and_path(self, key):
        n, rank = 30, 10
        A = spd_matrix(key, n, jnp.float32)
        P = Nystrom(NystromConfig(rank=rank, rho=1e-2))
        P._update(A, key=key)
        assert P.low_precision
        assert P.L is None
        _ = P._inv @ jnp.ones(n, dtype=jnp.float32)
        assert P.L is not None  # lazily built
        A64 = A.astype(jnp.float64)
        P64 = Nystrom(NystromConfig(rank=rank, rho=1e-2))
        P64._update(A64, key=key)
        assert not P64.low_precision
        _ = P64._inv @ jnp.ones(n, dtype=jnp.float64)
        assert P64.L is None  # Woodbury path, no factor needed

    def test_adaptive_damping(self, dtype, key):
        n, rank = 30, 10
        A = spd_matrix(key, n, dtype)
        P = Nystrom(NystromConfig(rank=rank, rho=1e-3, damping_mode="adaptive"))
        P._update(A, key=key)
        baseline = 1e-6
        P._update_damping(baseline_rho=baseline)
        assert jnp.allclose(P.rho, baseline + P.S[-1])

        Pn = Nystrom(NystromConfig(rank=rank, rho=1e-3, damping_mode="non_adaptive"))
        Pn._update(A, key=key)
        Pn._update_damping(baseline_rho=baseline)
        assert Pn.rho == 1e-3  # unchanged

    def test_update_through_linop(self, dtype, tol, key):
        n, rank = 30, 10
        A = spd_matrix(key, n, dtype)
        op = SymmetricLinOp(A.shape, matvec=lambda v: A @ v, dtype=dtype)
        P1 = Nystrom(NystromConfig(rank=rank, rho=1e-3))
        P1._update(op, key=key)
        P2 = Nystrom(NystromConfig(rank=rank, rho=1e-3))
        P2._update(A, key=key)
        assert jnp.allclose(P1.S, P2.S, rtol=1e3 * tol, atol=1e3 * tol)


class TestSkPre:
    def test_inverse_roundtrip(self, dtype, tol, key):
        m, d, s = 100, 20, 60
        A = jax.random.normal(key, (m, d), dtype=dtype)
        P = SkPre(SkPreConfig(sketch_size=s, rho=1e-3, sketch="gauss"))
        P._update(A, key=key)
        x = jax.random.normal(jax.random.fold_in(key, 1), (d,), dtype=dtype)
        assert jnp.allclose(P._inv @ (P @ x), x, rtol=1e4 * tol, atol=1e4 * tol)

    def test_small_sketch_warns(self, dtype, key):
        m, d = 50, 20
        A = jax.random.normal(key, (m, d), dtype=dtype)
        P = SkPre(SkPreConfig(sketch_size=10, rho=1e-3))
        with pytest.warns(UserWarning, match="Sketch size"):
            P._update(A, key=key)

    def test_update_through_linop(self, dtype, tol, key):
        m, d, s = 80, 15, 40
        A = jax.random.normal(key, (m, d), dtype=dtype)
        P1 = SkPre(SkPreConfig(sketch_size=s, rho=1e-3, sketch="gauss"))
        P1._update(aslinop(A), key=key)
        P2 = SkPre(SkPreConfig(sketch_size=s, rho=1e-3, sketch="gauss"))
        P2._update(A, key=key)
        assert jnp.allclose(P1.L, P2.L, rtol=1e4 * tol, atol=1e4 * tol)


class TestConfigsAndFactory:
    def test_factory_dispatch(self):
        assert isinstance(_get_precond(IdentityConfig()), Identity)
        assert isinstance(_get_precond(NewtonConfig(rho=1.0)), Newton)
        assert isinstance(_get_precond(NystromConfig(rank=5, rho=1.0)), Nystrom)
        assert isinstance(_get_precond(SkPreConfig(sketch_size=5, rho=1.0)), SkPre)

    def test_validation(self):
        with pytest.raises(ValueError):
            NewtonConfig(rho=-1.0)
        with pytest.raises(TypeError):
            NewtonConfig(rho=1)
        with pytest.raises(ValueError):
            NystromConfig(rank=0, rho=1.0)
        with pytest.raises(ValueError):
            NystromConfig(rank=5, rho=1.0, damping_mode="bogus")
        with pytest.raises(ValueError):
            SkPreConfig(sketch_size=-1, rho=1.0)
        with pytest.raises(TypeError):
            _is_precond_config("nope", "x")

    def test_to_dict(self):
        d = NystromConfig(rank=5, rho=1.0).to_dict()
        assert d["rank"] == 5 and d["damping_mode"] == "adaptive"
