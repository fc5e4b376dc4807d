"""SAP / ASkotch solver tests (dense and kernel-oracle problems)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
from rlaopt_tpu.linops import aslinop
from rlaopt_tpu.models import LinSys
from rlaopt_tpu.preconditioners import (
    IdentityConfig,
    NewtonConfig,
    NystromConfig,
    SkPreConfig,
)
from rlaopt_tpu.solvers import SAPConfig, SAPAccelConfig


@pytest.fixture
def krr_problem(key):
    n, d, k = 64, 3, 2
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float64)
    K = jnp.exp(-0.5 * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    B = jax.random.normal(kb, (n, k), dtype=jnp.float64)
    reg = 1e-2
    W_true = jnp.linalg.solve(K + reg * jnp.eye(n), B)
    return X, K, B, reg, W_true


def dense_oracles(K):
    return (lambda blk: aslinop(K[blk, :])), (lambda blk: aslinop(K[blk][:, blk]))


class TestSAP:
    def test_newton_exact_converges(self, krr_problem, key):
        X, K, B, reg, W_true = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=600, rtol=1e-6, blk_sz=16,
            precond_config=NewtonConfig(rho=reg), accel=False,
        )
        W, log = sys_.solve(cfg, jnp.zeros_like(B), callback_freq=100, key=key)
        err = float(jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true))
        assert err < 1e-5

    def test_f64_refine_forwards_oracles(self, krr_problem, key):
        """f64 refinement builds its correction LinSys with the SAME oracles
        as the base system: a SAP base solve must be able to refine (SAP's
        constructor requires the oracles, so omitting them crashed the
        refinement after the expensive base run)."""
        X, K, B, reg, W_true = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=300, rtol=1e-4, blk_sz=16,
            precond_config=NystromConfig(rank=16, rho=reg), accel=False,
        )
        W, log = sys_.solve(
            cfg, jnp.zeros_like(B), callback_freq=100, key=key,
            f64_refine_rounds=1,
        )
        hist = log["f64_refine"]["rel_res_f64"]
        assert max(hist[-1]) <= max(hist[0])

    def test_nystrom_accel_converges(self, krr_problem, key):
        X, K, B, reg, W_true = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=500, rtol=1e-5, blk_sz=16,
            precond_config=NystromConfig(rank=16, rho=reg),
            accel=True, accel_config=SAPAccelConfig(mu=0.05, nu=4.0),
        )
        W, log = sys_.solve(cfg, jnp.zeros_like(B), callback_freq=100, key=key)
        it = max(i for i in log.keys() if isinstance(i, int))
        rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
        assert rel < 1e-3

    def test_kernel_linop_oracles(self, krr_problem, key):
        """SAP through the matrix-free RBF operator's own oracles (the
        ASkotch-for-KRR configuration) — oracles traced inside lax.scan."""
        X, K, B, reg, W_true = krr_problem
        A = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
        sys_ = LinSys(
            A, B, reg=reg, A_row_oracle=A.row_oracle, A_blk_oracle=A.blk_oracle
        )
        cfg = SAPConfig(
            max_iters=400, rtol=1e-5, blk_sz=16,
            precond_config=NewtonConfig(rho=reg), accel=False,
        )
        W, log = sys_.solve(cfg, jnp.zeros_like(B), callback_freq=100, key=key)
        err = float(jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true))
        assert err < 1e-4

    def test_nystrom_rank_above_blk_sz_clamps(self, krr_problem, key):
        # A Nyström rank larger than the SAP block is clamped to the block
        # size (rank-blk_sz is exact on a blk_sz-dim block); this used to
        # blow up with a shape mismatch inside the per-block update.
        X, K, B, reg, W_true = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=400, rtol=1e-5, blk_sz=16,
            precond_config=NystromConfig(rank=48, rho=reg), accel=False,
        )
        with pytest.warns(UserWarning, match="clamping"):
            W, log = sys_.solve(
                cfg, jnp.zeros_like(B), callback_freq=100, key=key
            )
        err = float(jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true))
        assert err < 1e-4

    def test_identity_precond_runs(self, krr_problem, key):
        X, K, B, reg, W_true = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=50, rtol=1e-5, blk_sz=16,
            precond_config=IdentityConfig(), accel=False,
        )
        W, log = sys_.solve(cfg, jnp.zeros_like(B), callback_freq=25, key=key)
        assert jnp.all(jnp.isfinite(W))

    def test_invalid_precond_rejected(self, krr_problem, key):
        X, K, B, reg, _ = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=10, blk_sz=8,
            precond_config=SkPreConfig(sketch_size=8, rho=1e-2), accel=False,
        )
        with pytest.raises(TypeError):
            sys_.solve(cfg, jnp.zeros_like(B), key=key)

    def test_requires_oracles(self, krr_problem, key):
        X, K, B, reg, _ = krr_problem
        sys_ = LinSys(K, B, reg=reg)  # no oracles
        cfg = SAPConfig(max_iters=10, blk_sz=8, accel=False)
        with pytest.raises(ValueError):
            sys_.solve(cfg, jnp.zeros_like(B), key=key)

    def test_accel_config_validation(self):
        with pytest.raises(ValueError):
            SAPAccelConfig(mu=2.0, nu=1.0)  # mu > nu
        with pytest.raises(ValueError):
            SAPAccelConfig(mu=0.9, nu=2.0)  # mu*nu > 1
        with pytest.raises(ValueError):
            SAPConfig(max_iters=10, blk_sz=8, accel=True)  # missing accel cfg

    def test_mu_nu_boundary_warns_and_is_inert(self, krr_problem, key):
        """mu*nu == 1 is a degenerate point: gamma = 1 keeps V = Y = W
        invariant, so the accelerated recurrence IS plain SAP (the
        reference's own n=10M experiment runs there, mu=1e-2 nu=100)."""
        X, K, B, reg, _ = krr_problem
        row, blk = dense_oracles(K)
        with pytest.warns(UserWarning, match="inert"):
            accel_cfg = SAPAccelConfig(mu=0.01, nu=100.0)
        Ws = {}
        for accel in (True, False):
            sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
            cfg = SAPConfig(
                max_iters=40, rtol=1e-8, blk_sz=16,
                precond_config=NystromConfig(rank=16, rho=reg),
                accel=accel, accel_config=accel_cfg if accel else None,
            )
            W, _ = sys_.solve(
                cfg, jnp.zeros_like(B), callback_freq=20, key=key
            )
            Ws[accel] = W
        diff = float(
            jnp.linalg.norm(Ws[True] - Ws[False]) / jnp.linalg.norm(Ws[False])
        )
        assert diff < 1e-10  # f64 on CPU: identical up to rounding

    def test_kernel_payload_travels_as_jit_argument(self, krr_problem, key):
        """A KernelLinOp whose oracles are its own bound methods is passed
        through the chunk jit as an operand pytree (`_pass_A`), not baked
        into the program as constants — at n=10M the 2.4 GB closure
        constant broke the remote-compile tunnel (config 7). Iterates must
        match the closure path to f64 rounding (constant-folding may
        reorder a few flops; wrapping the same oracles in lambdas disables
        the rebind)."""
        from rlaopt_tpu.solvers.sap import SAP

        X, K, B, reg, _ = krr_problem
        A = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
        Ws = {}
        for wrap in (False, True):
            row = (lambda b: A.row_oracle(b)) if wrap else A.row_oracle
            blk = (lambda b: A.blk_oracle(b)) if wrap else A.blk_oracle
            sys_ = LinSys(A, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
            solver = SAP(
                sys_, jnp.zeros_like(B),
                precond_config=NystromConfig(rank=16, rho=reg),
                blk_sz=16, accel=False, accel_config=None, power_iters=10,
                key=key,
            )
            assert solver._pass_A is (not wrap)
            for _ in range(25):
                solver._step()
            Ws[wrap] = solver.W
        rel = float(
            jnp.linalg.norm(Ws[True] - Ws[False]) / jnp.linalg.norm(Ws[False])
        )
        assert rel < 1e-12


class TestBlkDense:
    """Per-iteration block-tile materialization (SAPConfig.blk_dense)."""

    def test_blk_dense_matches_streamed(self, krr_problem, key):
        """blk_dense on vs off: same kernel entries, same matmuls — the
        iterates agree to rounding on the kernel-oracle problem."""
        X, K, B, reg, W_true = krr_problem
        A = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
        outs = []
        for flag in (False, True):
            sys_ = LinSys(
                A, B, reg=reg,
                A_row_oracle=A.row_oracle, A_blk_oracle=A.blk_oracle,
            )
            cfg = SAPConfig(
                max_iters=60, rtol=1e-8, blk_sz=16,
                precond_config=NystromConfig(rank=8, rho=reg),
                accel=False, blk_dense=flag,
            )
            W, _ = sys_.solve(
                cfg, jnp.zeros_like(B), callback_freq=30, key=key
            )
            outs.append(W)
        diff = float(
            jnp.linalg.norm(outs[0] - outs[1]) / jnp.linalg.norm(outs[0])
        )
        assert diff < 1e-10, diff

    def test_kernel_blk_dense_values(self, krr_problem, key):
        """KernelLinOp.blk_dense equals the streamed oracle applied to I."""
        X, K, B, reg, _ = krr_problem
        A = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
        blk = jnp.asarray([3, 7, 11, 42])
        dense = A.blk_dense(blk)
        streamed = A.blk_oracle(blk) @ jnp.eye(4, dtype=X.dtype)
        assert jnp.allclose(dense, streamed, rtol=1e-12, atol=1e-14)
        assert jnp.allclose(dense, K[blk][:, blk], rtol=1e-12, atol=1e-14)

    def test_blk_dense_requires_capable_oracle(self, krr_problem, key):
        X, K, B, reg, _ = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=5, blk_sz=8, accel=False, blk_dense=True,
            precond_config=NewtonConfig(rho=reg),
        )
        with pytest.raises(ValueError, match="blk_dense"):
            sys_.solve(cfg, jnp.zeros_like(B), key=key)

    def test_auto_budget_gate(self, krr_problem, key):
        """Auto mode declines when the tile exceeds the budget."""
        from rlaopt_tpu.solvers.sap import SAP

        X, K, B, reg, _ = krr_problem
        A = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
        sys_ = LinSys(
            A, B, reg=reg,
            A_row_oracle=A.row_oracle, A_blk_oracle=A.blk_oracle,
        )
        solver = SAP(
            system=sys_, W_init=jnp.zeros_like(B),
            precond_config=NewtonConfig(rho=reg), blk_sz=16,
            accel=False, accel_config=None, power_iters=2, key=key,
        )
        assert solver._blk_dense_fn is not None  # small tile: auto-on
        old = SAP._BLK_DENSE_BUDGET
        try:
            SAP._BLK_DENSE_BUDGET = 16  # force over-budget
            solver2 = SAP(
                system=sys_, W_init=jnp.zeros_like(B),
                precond_config=NewtonConfig(rho=reg), blk_sz=16,
                accel=False, accel_config=None, power_iters=2, key=key,
            )
            assert solver2._blk_dense_fn is None
        finally:
            SAP._BLK_DENSE_BUDGET = old


class TestHostSampling:
    """SAPConfig.sampling: host-drawn block schedules vs in-trace choice."""

    def test_host_sampling_converges(self, krr_problem, key):
        """Forced host sampling solves the problem to the same tolerance
        as the in-trace sampler (same distribution, different stream)."""
        X, K, B, reg, W_true = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        cfg = SAPConfig(
            max_iters=600, rtol=1e-6, blk_sz=16,
            precond_config=NewtonConfig(rho=reg), accel=False,
            sampling="host",
        )
        W, _ = sys_.solve(cfg, jnp.zeros_like(B), callback_freq=100, key=key)
        err = float(jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true))
        assert err < 1e-5

    def test_host_draws_are_valid_and_deterministic(self, krr_problem, key):
        from rlaopt_tpu.solvers.sap import SAP

        X, K, B, reg, _ = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)

        def make():
            return SAP(
                system=sys_, W_init=jnp.zeros_like(B),
                precond_config=NewtonConfig(rho=reg), blk_sz=16,
                accel=False, accel_config=None, power_iters=2, key=key,
                sampling="host",
            )

        s1, s2 = make(), make()
        b1 = np.asarray(s1._sample_host_blocks(5))
        b2 = np.asarray(s2._sample_host_blocks(5))
        assert b1.shape == (5, 16)
        np.testing.assert_array_equal(b1, b2)  # same key, same t → same draws
        n = K.shape[0]
        assert b1.min() >= 0 and b1.max() < n
        for step in b1:  # without replacement within each step
            assert len(set(step.tolist())) == len(step)
        # draws differ across steps with overwhelming probability
        assert not np.array_equal(b1[0], b1[1])

    def test_auto_threshold(self, krr_problem, key):
        from rlaopt_tpu.solvers.sap import SAP

        X, K, B, reg, _ = krr_problem
        row, blk = dense_oracles(K)
        sys_ = LinSys(K, B, reg=reg, A_row_oracle=row, A_blk_oracle=blk)
        solver = SAP(
            system=sys_, W_init=jnp.zeros_like(B),
            precond_config=NewtonConfig(rho=reg), blk_sz=16,
            accel=False, accel_config=None, power_iters=2, key=key,
        )
        assert not solver._host_sampling  # n=64 stays on-device
        forced = SAP(
            system=sys_, W_init=jnp.zeros_like(B),
            precond_config=NewtonConfig(rho=reg), blk_sz=16,
            accel=False, accel_config=None, power_iters=2, key=key,
            sampling="host",
        )
        assert forced._host_sampling

    def test_bad_sampling_value(self):
        with pytest.raises(ValueError, match="sampling"):
            SAPConfig(max_iters=10, blk_sz=8, accel=False, sampling="gpu")


class TestAccelFromPilot:
    """Round 4 (VERDICT r3 item 4): accelerated SAP with (mu, nu) from a
    plain-SAP pilot measurably beats plain at equal iterations."""

    @pytest.mark.slow
    def test_accel_beats_plain_trajectory(self, key):
        from rlaopt_tpu.solvers import sap_accel_from_pilot

        n, d = 2048, 10
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), jnp.float32)
        y = jax.random.normal(kb, (n,), jnp.float32)
        reg = 1e-5 * n
        K = RBFLinOp(X, X, KernelConfig(lengthscale=float(d) ** 0.5))
        blk = n // 8
        base = dict(
            rtol=1e-9, blk_sz=blk,
            precond_config=NystromConfig(rank=128, rho=float(reg)),
            power_iters=10,
        )

        def run(cfg, iters):
            sys_ = LinSys(
                K, y, reg=float(reg),
                A_row_oracle=K.row_oracle, A_blk_oracle=K.blk_oracle,
            )
            W, log = sys_.solve(
                cfg, jnp.zeros((n, 1), jnp.float32), callback_freq=iters,
                key=jax.random.PRNGKey(7), metrics="true",
            )
            it = max(i for i in log if isinstance(i, int))
            return float(
                jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"])
            )

        pilot_iters, run_iters = 50, 150
        pilot = run(SAPConfig(max_iters=pilot_iters, accel=False, **base),
                    pilot_iters)
        acc = sap_accel_from_pilot(pilot, pilot_iters, n, blk)
        assert 0 < acc.mu * acc.nu < 1
        plain = run(SAPConfig(max_iters=run_iters, accel=False, **base),
                    run_iters)
        accel = run(
            SAPConfig(max_iters=run_iters, accel=True, accel_config=acc,
                      **base),
            run_iters,
        )
        # measured at n=4096: 5.5x; demand a robust 1.5x at this size
        assert accel < plain / 1.5, (pilot, acc, plain, accel)

    def test_pilot_validation(self):
        from rlaopt_tpu.solvers import sap_accel_from_pilot

        with pytest.raises(ValueError, match="rel_res"):
            sap_accel_from_pilot(1.5, 50, 1000, 100)
        cfg = sap_accel_from_pilot(0.3, 50, 1000, 100)
        assert cfg.mu * cfg.nu < 1
