"""Spectral estimator tests: powering, Hutchinson, Hutch++, Lanczos, Frobenius."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.linops import SymmetricLinOp, aslinop
from rlaopt_tpu.spectral_estimators import (
    fro_norm_est,
    hutch_plus_plus,
    hutchinson,
    lanczos_eigsh,
    randomized_powering,
)


@pytest.fixture
def spd(key, dtype):
    n = 80
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (n, n), dtype=dtype))
    eigs = jnp.linspace(5.0, 0.1, n, dtype=dtype)
    A = (Q * eigs) @ Q.T
    return (A + A.T) / 2, eigs


class TestRandomizedPowering:
    def test_estimates_lambda_max(self, spd, key, dtype):
        A, eigs = spd
        sig, v = randomized_powering(A, max_iters=100, rtol=1e-6, key=key)
        assert abs(float(sig) - 5.0) / 5.0 < 1e-2
        assert v.shape == (A.shape[0],)

    def test_through_linop(self, spd, key, dtype):
        A, _ = spd
        op = SymmetricLinOp(A.shape, matvec=lambda x: A @ x, dtype=dtype)
        sig, _ = randomized_powering(op, max_iters=100, rtol=1e-6, key=key)
        assert abs(float(sig) - 5.0) / 5.0 < 1e-2

    def test_jittable(self, spd, key):
        A, _ = spd

        @jax.jit
        def f(M, k):
            return randomized_powering(M, max_iters=20, key=k)[0]

        assert jnp.isfinite(f(A, key))

    def test_respects_max_iters(self, spd, key):
        A, _ = spd
        # one iteration: estimate is the Rayleigh quotient of a random vector
        sig1, _ = randomized_powering(A, max_iters=1, rtol=0.0, key=key)
        sig100, _ = randomized_powering(A, max_iters=100, rtol=1e-9, key=key)
        assert float(sig100) >= float(sig1) - 1e-6


class TestTraceEstimators:
    def test_hutchinson(self, spd, key, dtype):
        A, eigs = spd
        true_trace = float(jnp.sum(eigs))
        tr, var = hutchinson(A, 200, "gauss", key)
        assert abs(float(tr) - true_trace) / true_trace < 0.2
        assert float(var) >= 0.0

    def test_hutchinson_sparse_probe(self, spd, key):
        A, eigs = spd
        tr, _ = hutchinson(A, 200, "sparse", key)
        assert abs(float(tr) - float(jnp.sum(eigs))) / float(jnp.sum(eigs)) < 0.25

    def test_hutch_plus_plus_more_accurate(self, spd, key):
        A, eigs = spd
        true_trace = float(jnp.sum(eigs))
        t = hutch_plus_plus(A, 60, key=key)
        assert abs(float(t) - true_trace) / true_trace < 0.1

    def test_through_linop(self, spd, key, dtype):
        A, _ = spd
        op = SymmetricLinOp(A.shape, matvec=lambda x: A @ x, dtype=dtype)
        tr_op, _ = hutchinson(op, 100, "gauss", key)
        tr_d, _ = hutchinson(A, 100, "gauss", key)
        assert np.allclose(tr_op, tr_d, rtol=1e-3)


class TestFrobenius:
    def test_fro_norm_est(self, key, dtype):
        M = jax.random.normal(key, (50, 30), dtype=dtype)
        true_sq = float(jnp.sum(M * M))
        est, _ = fro_norm_est(aslinop(M), 150, "gauss", key)
        assert abs(float(est) - true_sq) / true_sq < 0.25


class TestLanczos:
    def test_extremal_eigs(self, spd, key):
        A, eigs = spd
        ev = lanczos_eigsh(A, num_iters=40, key=key)
        assert abs(float(ev[-1]) - 5.0) / 5.0 < 1e-3

    def test_through_linop(self, spd, key, dtype):
        A, _ = spd
        op = SymmetricLinOp(A.shape, matvec=lambda x: A @ x, dtype=dtype)
        ev = lanczos_eigsh(op, num_iters=40, key=key)
        assert abs(float(ev[-1]) - 5.0) / 5.0 < 1e-3
