"""LSQR + LstSq tests: sketch-and-precondition least squares (BASELINE #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.linops import aslinop
from rlaopt_tpu.models import LstSq
from rlaopt_tpu.preconditioners import (
    IdentityConfig,
    NewtonConfig,
    SkPreConfig,
)
from rlaopt_tpu.solvers import LSQRConfig


@pytest.fixture
def ls_problem(key):
    m, n, k = 300, 40, 2
    ka, kb = jax.random.split(key)
    # Ill-conditioned tall matrix: scaled columns
    A = jax.random.normal(ka, (m, n), dtype=jnp.float64)
    A = A * jnp.logspace(0, -4, n)[None, :]
    B = jax.random.normal(kb, (m, k), dtype=jnp.float64)
    W_true = jnp.linalg.lstsq(A, B)[0]
    return A, B, W_true


def final_rel(log):
    it = max(i for i in log.keys() if isinstance(i, int))
    return float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))


class TestLSQR:
    def test_plain_lsqr_converges(self, ls_problem, key):
        A, B, W_true = ls_problem
        model = LstSq(A, B)
        cfg = LSQRConfig(max_iters=500, rtol=1e-10)
        W, log = model.solve(cfg, jnp.zeros_like(W_true), key=key)
        err = float(jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true))
        assert err < 1e-6

    @pytest.mark.parametrize("sketch", ["gauss", "sparse", "srht"])
    def test_skpre_accelerates(self, ls_problem, key, sketch):
        """Sketch-and-precondition: far fewer iterations than plain LSQR on
        an ill-conditioned system."""
        A, B, W_true = ls_problem

        def iters(pc, max_iters=500):
            model = LstSq(A, B)
            cfg = LSQRConfig(
                max_iters=max_iters, rtol=1e-8, precond_config=pc
            )
            W, log = model.solve(
                cfg, jnp.zeros_like(W_true), callback_freq=5, key=key
            )
            err = float(
                jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true)
            )
            return max(i for i in log.keys() if isinstance(i, int)), err

    # sketch size 4x cols, standard sketch-and-precondition regime
        it_pre, err_pre = iters(
            SkPreConfig(sketch_size=160, rho=0.0, sketch=sketch)
        )
        it_plain, err_plain = iters(IdentityConfig())
        assert err_pre < 1e-6
        assert it_pre < it_plain

    def test_through_linop(self, ls_problem, key):
        A, B, W_true = ls_problem
        model = LstSq(aslinop(A), B)
        cfg = LSQRConfig(
            max_iters=200, rtol=1e-9,
            precond_config=SkPreConfig(sketch_size=160, rho=0.0, sketch="gauss"),
        )
        W, log = model.solve(cfg, jnp.zeros_like(W_true), key=key)
        err = float(jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true))
        assert err < 1e-6

    def test_damped(self, ls_problem, key):
        A, B, _ = ls_problem
        damp = 0.1
        n = A.shape[1]
        W_reg = jnp.linalg.solve(
            A.T @ A + damp**2 * jnp.eye(n, dtype=A.dtype), A.T @ B
        )
        model = LstSq(A, B, damp=damp)
        cfg = LSQRConfig(max_iters=500, rtol=1e-10, damp=damp)
        W, log = model.solve(cfg, jnp.zeros_like(W_reg), key=key)
        err = float(jnp.linalg.norm(W - W_reg) / jnp.linalg.norm(W_reg))
        assert err < 1e-6

    def test_invalid_precond(self, ls_problem, key):
        A, B, W_true = ls_problem
        model = LstSq(A, B)
        cfg = LSQRConfig(
            max_iters=10, precond_config=NewtonConfig(rho=1.0)
        )
        with pytest.raises(TypeError):
            model.solve(cfg, jnp.zeros_like(W_true), key=key)

    def test_f32(self, key):
        m, n = 200, 30
        ka, kb = jax.random.split(key)
        A = jax.random.normal(ka, (m, n), dtype=jnp.float32)
        B = jax.random.normal(kb, (m,), dtype=jnp.float32)
        model = LstSq(A, B)
        cfg = LSQRConfig(
            max_iters=100, rtol=1e-4,
            precond_config=SkPreConfig(sketch_size=120, rho=0.0, sketch="gauss"),
        )
        W, log = model.solve(cfg, jnp.zeros((n, 1), dtype=jnp.float32), key=key)
        assert final_rel(log) < 1e-3
