"""End-to-end slice: LinSys + PCG (+ preconditioners) on synthetic SPD systems.

Mirrors BASELINE config #1 (Nyström-PCG on an ill-conditioned SPD system) and
the reference experiment scale patterns (eigenvalues i^-2, reg=1e-6,
``experiments/distributed_linsys_solve_test.py:28-42``) at test size.
"""

import jax
import jax.numpy as jnp
import pytest

from rlaopt_tpu.linops import SymmetricLinOp, aslinop
from rlaopt_tpu.models import LinSys
from rlaopt_tpu.preconditioners import (
    IdentityConfig,
    NewtonConfig,
    NystromConfig,
)
from rlaopt_tpu.solvers import PCGConfig


def make_spd_system(key, n, k, dtype, cond_exp=2.0):
    """SPD matrix with eigenvalues i^-cond_exp, plus RHS."""
    kq, kb = jax.random.split(key)
    Q, _ = jnp.linalg.qr(jax.random.normal(kq, (n, n), dtype=dtype))
    eigs = jnp.arange(1, n + 1, dtype=dtype) ** -cond_exp
    A = (Q * eigs) @ Q.T
    A = (A + A.T) / 2
    B = jax.random.normal(kb, (n, k), dtype=dtype)
    return A, B


def final_rel_res(log):
    last = log[max(i for i in log.keys() if isinstance(i, int))]
    return jnp.max(last["metrics"]["internal_metrics"]["rel_res"])


class TestPCGLinSys:
    @pytest.mark.parametrize(
        "precond",
        ["identity", "newton", "nystrom"],
    )
    def test_converges_dense_f64(self, key, precond):
        n, k = 200, 3
        A, B = make_spd_system(key, n, k, jnp.float64)
        reg = 1e-6
        sys = LinSys(A, B, reg=reg)
        pc = {
            "identity": IdentityConfig(),
            "newton": NewtonConfig(rho=reg),
            "nystrom": NystromConfig(rank=80, rho=reg),
        }[precond]
        cfg = PCGConfig(max_iters=500, rtol=1e-8, atol=0.0, precond_config=pc)
        W, log = sys.solve(cfg, jnp.zeros_like(B), key=key)
        assert final_rel_res(log) < 1e-7
        # true solution check
        W_true = jnp.linalg.solve(A + reg * jnp.eye(n, dtype=A.dtype), B)
        assert jnp.linalg.norm(W - W_true) / jnp.linalg.norm(W_true) < 1e-5

    def test_converges_f32_nystrom(self, key):
        n, k = 150, 2
        A, B = make_spd_system(key, n, k, jnp.float32, cond_exp=1.0)
        reg = 1e-4
        sys = LinSys(A, B, reg=reg)
        cfg = PCGConfig(
            max_iters=300,
            rtol=1e-5,
            precond_config=NystromConfig(rank=60, rho=reg),
        )
        W, log = sys.solve(cfg, jnp.zeros_like(B), key=key)
        assert final_rel_res(log) < 1e-4

    def test_through_linop(self, key):
        n, k = 100, 2
        A, B = make_spd_system(key, n, k, jnp.float64)
        op = SymmetricLinOp(A.shape, matvec=lambda v: A @ v, dtype=A.dtype)
        sys = LinSys(op, B, reg=1e-6)
        cfg = PCGConfig(max_iters=300, rtol=1e-8)
        W, log = sys.solve(cfg, jnp.zeros_like(B), key=key)
        assert final_rel_res(log) < 1e-7

    def test_1d_rhs_promoted(self, key):
        n = 50
        A, B = make_spd_system(key, n, 1, jnp.float64)
        sys = LinSys(A, B[:, 0], reg=1e-6)
        assert sys.B.shape == (n, 1)
        cfg = PCGConfig(max_iters=200, rtol=1e-8)
        W, log = sys.solve(cfg, jnp.zeros((n, 1), dtype=A.dtype), key=key)
        assert final_rel_res(log) < 1e-7

    def test_nystrom_preconditioning_accelerates(self, key):
        """Nyström-PCG needs far fewer iterations than plain CG on an
        ill-conditioned system (the point of the preconditioner)."""
        n, k = 300, 2
        A, B = make_spd_system(key, n, k, jnp.float64, cond_exp=2.0)
        reg = 1e-8

        def iters_to_converge(pc):
            sys = LinSys(A, B, reg=reg)
            cfg = PCGConfig(
                max_iters=400, rtol=1e-6, precond_config=pc
            )
            _, log = sys.solve(
                cfg, jnp.zeros_like(B), callback_freq=5, key=key
            )
            return max(i for i in log.keys() if isinstance(i, int))

        it_nys = iters_to_converge(NystromConfig(rank=150, rho=reg))
        it_id = iters_to_converge(IdentityConfig())
        assert it_nys < it_id

    def test_callback_and_log_structure(self, key):
        n = 60
        A, B = make_spd_system(key, n, 1, jnp.float64)
        sys = LinSys(A, B, reg=1e-6)
        cfg = PCGConfig(max_iters=50, rtol=1e-10)
        seen = []

        def cb(w, model, tag):
            seen.append(tag)
            return {"wnorm": float(jnp.linalg.norm(w))}

        W, log = sys.solve(
            cfg,
            jnp.zeros_like(B),
            callback_fn=cb,
            callback_args=["t"],
            callback_freq=10,
            key=key,
        )
        assert all(t == "t" for t in seen)
        for i, entry in log.items():
            assert i % 10 == 0
            assert "iter_time" in entry and "cum_time" in entry
            assert "callback" in entry["metrics"]
            assert "internal_metrics" in entry["metrics"]

    def test_validation_errors(self, key):
        n = 10
        A, B = make_spd_system(key, n, 1, jnp.float64)
        with pytest.raises(TypeError):
            LinSys("A", B)
        with pytest.raises(ValueError):
            LinSys(A, B, reg=-1.0)
        with pytest.raises(ValueError):
            LinSys(A, B, A_row_oracle=lambda b: None)  # missing blk oracle
        sys = LinSys(A, B)
        with pytest.raises(TypeError):
            sys.solve("not a config", B)
        with pytest.raises(ValueError):
            sys.solve(
                PCGConfig(), jnp.zeros_like(B), log_in_wandb=True,
            )

    def test_early_termination_at_zero(self, key):
        """If W_init already solves the system, no iterations run."""
        n = 40
        A, B = make_spd_system(key, n, 1, jnp.float64)
        reg = 1e-6
        W_true = jnp.linalg.solve(A + reg * jnp.eye(n, dtype=A.dtype), B)
        sys = LinSys(A, B, reg=reg)
        cfg = PCGConfig(max_iters=100, rtol=1e-5)
        W, log = sys.solve(cfg, W_true, key=key)
        assert list(log.keys()) == [0]

    def test_per_column_masking_freezes_converged(self, key):
        """One easy column + one hard column: after the easy column's
        convergence its iterates must stay frozen while the hard one keeps
        improving."""
        n = 80
        A, _ = make_spd_system(key, n, 1, jnp.float64)
        reg = 1e-6
        W_easy = jax.random.normal(jax.random.fold_in(key, 1), (n,))
        b_easy = A @ W_easy + reg * W_easy
        b_hard = jax.random.normal(jax.random.fold_in(key, 2), (n,)) * 100
        B = jnp.stack([b_easy, b_hard], axis=1)
        sys = LinSys(A, B, reg=reg)
        cfg = PCGConfig(max_iters=200, rtol=1e-4)

        snapshots = []

        def cb(w, model):
            snapshots.append(w[:, 0].copy())
            return {}

        sys.solve(cfg, jnp.zeros_like(B), callback_fn=cb, callback_freq=5, key=key)
        # find first snapshot where easy column converged
        res = [
            float(jnp.linalg.norm(b_easy - (A @ w + reg * w))) for w in snapshots
        ]
        tol = 1e-4 * float(jnp.linalg.norm(b_easy))
        conv_idx = [i for i, r in enumerate(res) if r <= tol]
        assert conv_idx, "easy column never converged"
        # all later snapshots identical to the first converged one (frozen),
        # allowing one extra chunk for the mask to update
        first = conv_idx[0] + 1
        for later in range(first + 1, len(snapshots)):
            assert jnp.array_equal(snapshots[first], snapshots[later])


class TestConfigSerialization:
    def test_solver_config_to_dict_nests(self):
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import SAPAccelConfig, SAPConfig

        cfg = SAPConfig(
            max_iters=5, blk_sz=4,
            precond_config=NystromConfig(rank=3, rho=1e-2),
            accel=True, accel_config=SAPAccelConfig(mu=0.1, nu=2.0),
        )
        d = cfg.to_dict()
        assert d["max_iters"] == 5
        assert d["precond_config"]["rank"] == 3
        assert d["precond_config"]["damping_mode"] == "adaptive"
        assert d["accel_config"]["mu"] == 0.1

    def test_wandb_kwargs_merge_and_warn(self, key):
        import warnings

        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.solvers import PCGConfig

        n = 8
        A = jnp.eye(n)
        sys_ = LinSys(A, jnp.ones((n, 1)), reg=0.0)
        cfg = PCGConfig(max_iters=2)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            kw = sys_._get_wandb_kwargs(
                log_in_wandb=True,
                wandb_init_kwargs={"project": "p", "config": {"extra": 1}},
                solver_name="pcg",
                solver_config=cfg,
                callback_freq=10,
            )
        assert kw["project"] == "p"
        assert kw["config"]["solver_name"] == "pcg"
        assert kw["config"]["extra"] == 1  # merged
        assert any("config" in str(w.message) for w in rec)
        assert (
            sys_._get_wandb_kwargs(False, None, "pcg", cfg, 10) is None
        )


class TestPreconditionerReuse:
    def test_prebuilt_preconditioner_matches_internal(self, key):
        """solve(preconditioner=P) skips factorization but converges the
        same as letting the solver build P itself (same key → same sketch)."""
        from rlaopt_tpu.preconditioners import Nystrom

        A, B = make_spd_system(key, 128, 2, jnp.float32)
        reg = 1e-4
        cfg = PCGConfig(
            max_iters=60, rtol=1e-6,
            precond_config=NystromConfig(rank=48, rho=reg),
        )
        W0 = jnp.zeros_like(B)
        sys_ = LinSys(A, B, reg=reg)
        W_auto, _ = sys_.solve(cfg, W0, callback_freq=10, key=key)

        P = Nystrom(NystromConfig(rank=48, rho=reg))
        P._update(sys_.A, key=key)
        P._update_damping(baseline_rho=reg)
        W_pre, _ = LinSys(A, B, reg=reg).solve(
            cfg, W0, callback_freq=10, key=key, preconditioner=P
        )
        assert jnp.allclose(W_auto, W_pre, rtol=1e-5, atol=1e-6)

    def test_refinement_factors_once(self, key, monkeypatch):
        """f64 refinement reuses the base solve's factor: the correction
        systems share the operator/reg, so Nystrom._update runs exactly
        once across base + all rounds."""
        from rlaopt_tpu.preconditioners import Nystrom

        calls = {"n": 0}
        orig = Nystrom._update

        def counting_update(self, A, *args, **kwargs):
            calls["n"] += 1
            return orig(self, A, *args, **kwargs)

        monkeypatch.setattr(Nystrom, "_update", counting_update)
        A, B = make_spd_system(key, 96, 2, jnp.float32)
        cfg = PCGConfig(
            max_iters=50, rtol=1e-9,
            precond_config=NystromConfig(rank=48, rho=1e-2),
        )
        W64, log = LinSys(A, B, reg=1e-2).solve(
            cfg, jnp.zeros_like(B), callback_freq=10, key=key,
            f64_refine_rounds=2,
        )
        assert calls["n"] == 1
        assert max(log["f64_refine"]["rel_res_f64"][-1]) < 1e-7

    def test_sap_rejects_prebuilt(self, key):
        from rlaopt_tpu.preconditioners import Nystrom
        from rlaopt_tpu.solvers import SAPConfig

        A, B = make_spd_system(key, 64, 1, jnp.float32)
        P = Nystrom(NystromConfig(rank=16, rho=1e-2))
        cfg = SAPConfig(
            max_iters=4, rtol=1e-6, blk_sz=16, accel=False,
            precond_config=NystromConfig(rank=8, rho=1e-2),
        )
        with pytest.raises(ValueError, match="per-block"):
            LinSys(A, B, reg=1e-2).solve(
                cfg, jnp.zeros_like(B), key=key, preconditioner=P
            )


class TestRecurrenceMetrics:
    """LinSys.solve(metrics=...): carried-residual logging + confirmation."""

    def test_recurrence_converges_and_final_is_confirmed(self, key):
        A, B = make_spd_system(key, 128, 2, jnp.float32)
        reg = 1e-4
        # rtol REACHABLE by this f32 problem (it floors ~4e-5): with an
        # unreachable target the round-4 stall detection legitimately
        # stops the recurrence run early at the certified floor, and the
        # two runs' iterates then differ by construction (see
        # test_stall_terminates_early_with_true_residual).
        cfg = PCGConfig(
            max_iters=80, rtol=2e-4,
            precond_config=NystromConfig(rank=48, rho=reg),
        )
        W0 = jnp.zeros_like(B)
        W_t, log_t = LinSys(A, B, reg=reg).solve(
            cfg, W0, callback_freq=10, key=key, metrics="true"
        )
        W_r, log_r = LinSys(A, B, reg=reg).solve(
            cfg, W0, callback_freq=10, key=key, metrics="recurrence"
        )
        # identical iterates: the metric source changes logging, not math
        assert jnp.allclose(W_t, W_r, rtol=0, atol=0)
        last = max(log_r.keys())
        final = log_r[last]["metrics"]["internal_metrics"]
        # the converged/final boundary is always re-evaluated with a true
        # residual — never reported from the recurrence
        assert "source" not in final
        tm = log_t[max(log_t.keys())]["metrics"]["internal_metrics"]
        assert jnp.allclose(final["rel_res"], tm["rel_res"], rtol=1e-3)
        # intermediate boundaries carry the recurrence tag
        mids = [i for i in log_r.keys() if 0 < i < last]
        if mids:
            assert (
                log_r[mids[0]]["metrics"]["internal_metrics"].get("source")
                == "recurrence"
            )

    def test_final_partial_chunk_is_logged_and_true(self, key):
        """max_iters not a multiple of callback_freq: the final iterate must
        still be logged, termination-checked, and true-residual-backed (the
        force_true replacement used to be skipped because the off-frequency
        boundary returned no log entry)."""
        A, B = make_spd_system(key, 128, 2, jnp.float32)
        reg = 1e-4
        cfg = PCGConfig(
            max_iters=25, rtol=1e-12,
            precond_config=NystromConfig(rank=48, rho=reg),
        )
        _, log = LinSys(A, B, reg=reg).solve(
            cfg, jnp.zeros_like(B), callback_freq=10, key=key,
            metrics="recurrence",
        )
        assert 25 in log
        assert "source" not in log[25]["metrics"]["internal_metrics"]

    def test_estimator_source_freezes_conservatively(self, key):
        """Per-column freezing from an ESTIMATOR residual requires clearing
        0.5x tolerance; a true residual freezes at tolerance. An optimistic
        estimate dipping just under tol must not pause a column."""
        A, B = make_spd_system(key, 32, 2, jnp.float32)
        sys_ = LinSys(A, B, reg=1e-2)
        b = jnp.linalg.norm(sys_.B, axis=0)
        rtol = 0.1
        # column 0 sits at 0.8x tol (under tol, over 0.5x tol); column 1 far
        # above tol so the all-columns decision is False either way.
        abs_res = jnp.stack([0.08 * b[0], 0.5 * b[1]])
        est = {"abs_res": abs_res, "rel_res": abs_res / b, "source": "recurrence"}
        done = sys_._check_termination_criteria(est, atol=0.0, rtol=rtol)
        assert not done
        assert bool(sys_.mask[0])  # still active: unconfirmed claim
        true = {"abs_res": abs_res, "rel_res": abs_res / b}
        done = sys_._check_termination_criteria(true, atol=0.0, rtol=rtol)
        assert not done
        assert not bool(sys_.mask[0])  # frozen: true residual cleared tol

    def test_auto_keeps_true_metrics_on_small_problems(self, key):
        A, B = make_spd_system(key, 96, 2, jnp.float32)
        cfg = PCGConfig(
            max_iters=30, rtol=1e-6,
            precond_config=NystromConfig(rank=32, rho=1e-3),
        )
        _, log = LinSys(A, B, reg=1e-3).solve(
            cfg, jnp.zeros_like(B), callback_freq=10, key=key
        )
        for entry in log.values():
            assert "source" not in entry["metrics"]["internal_metrics"]

    def test_failed_confirm_not_repeated(self, key):
        """When the estimator claims convergence but the TRUE residual
        floors above tolerance (the generic reduced-precision-operator
        situation), the expensive true-residual confirm must run once,
        record the (true/estimator) gap, and NOT re-run at the next
        boundary — subsequent metrics are the gap-adjusted prediction."""
        A, B = make_spd_system(key, 128, 2, jnp.float32)
        W = jnp.zeros_like(B)
        sys_ = LinSys(A, B, reg=1e-3)
        sys_._metrics_recurrence = True
        sys_._metrics_sampled = False
        sys_._confirm_gap = 1.0
        # rtol chosen so the tiny fake recurrence passes but the true
        # residual (‖B‖-sized at W=0) badly fails
        sys_._term_tol = (0.0, 1e-6)

        class _FakeSolver:
            def residual(self):
                return jnp.full_like(B, 1e-9)

        sys_._metrics_solver = _FakeSolver()
        calls = []
        orig = sys_._true_internal_metrics

        def counting_true(Wx):
            calls.append(1)
            return orig(Wx)

        sys_._true_internal_metrics = counting_true
        m1 = sys_._compute_internal_metrics(W)
        assert len(calls) == 1  # first claim was confirmed (and failed)
        assert sys_._confirm_gap > 1.0
        m2 = sys_._compute_internal_metrics(W)
        assert len(calls) == 1  # no second confirm
        assert m2.get("source") == "recurrence"
        # the gap is a scalar (max over columns): the prediction matches
        # the worst column exactly and over-predicts the rest — always
        # conservative, so the termination check cannot falsely pass
        true_abs = m1["abs_res"]
        assert bool(jnp.all(m2["abs_res"] >= true_abs * (1 - 1e-5)))
        assert jnp.allclose(
            jnp.max(m2["abs_res"]), jnp.max(true_abs), rtol=1e-5
        )

    def test_sampled_metrics_sap(self, key):
        """metrics='sampled' on a SAP solve: intermediate boundaries carry
        the sampled tag + stderr, the final entry is true-evaluated, and
        the estimates track the true residual."""
        from rlaopt_tpu.linops import aslinop
        from rlaopt_tpu.solvers import SAPConfig

        A, B = make_spd_system(key, 256, 2, jnp.float32)
        row = lambda blk: aslinop(A[blk, :])  # noqa: E731
        blk_o = lambda blk: aslinop(A[blk][:, blk])  # noqa: E731
        sys_ = LinSys(A, B, reg=1e-3, A_row_oracle=row, A_blk_oracle=blk_o)
        cfg = SAPConfig(
            max_iters=40, blk_sz=32, accel=False, rtol=1e-6,
            precond_config=NewtonConfig(rho=1e-3),
        )
        W, log = sys_.solve(
            cfg, jnp.zeros_like(B), callback_freq=10, key=key,
            metrics="sampled",
        )
        last = max(i for i in log.keys() if isinstance(i, int))
        final = log[last]["metrics"]["internal_metrics"]
        assert "source" not in final
        mids = [i for i in log.keys() if 0 < i < last]
        mid = log[mids[0]]["metrics"]["internal_metrics"]
        assert mid.get("source") == "sampled"
        assert 0 < mid["rel_stderr_est"] < 0.05  # s=n=256 → 1/sqrt(512)
        # estimate within a few stderr of the truth (n=256 → s=n: exact)
        true_m = sys_._compute_internal_metrics(W, force_true=True)
        assert jnp.allclose(
            final["rel_res"], true_m["rel_res"], rtol=1e-5
        )

    @pytest.mark.slow
    def test_sampled_metrics_estimator_accuracy(self, key):
        """At n >> s the sampled estimate sits within a few stderr of the
        full residual norm (direct unit test of the estimator)."""
        n = 16384
        ka, kb, kw = jax.random.split(key, 3)
        G = jax.random.normal(ka, (n, 8), dtype=jnp.float32)
        M = (G @ G.T) / 8 + 2.0 * jnp.eye(n, dtype=jnp.float32)
        B = jax.random.normal(kb, (n, 2), dtype=jnp.float32)
        W = jax.random.normal(kw, (n, 2), dtype=jnp.float32)
        sys_ = LinSys(M, B, reg=0.1)
        sys_._metrics_sampled = True
        sys_._metrics_recurrence = False
        sys_._term_tol = (0.0, 1e-30)  # thresholds never met → no confirm
        est = sys_._compute_internal_metrics(W)
        true = sys_._compute_internal_metrics(W, force_true=True)
        assert est.get("source") == "sampled"
        rel_err = jnp.abs(est["rel_res"] - true["rel_res"]) / true["rel_res"]
        # stderr ≈ 1/sqrt(2·4096) ≈ 1.1% — allow 5 stderr
        assert float(jnp.max(rel_err)) < 0.055, rel_err

    def test_true_residual_chunked_matches_single_call(self, key, monkeypatch):
        """Past the per-call kernel-value budget, the true residual is
        evaluated in row blocks (watchdog safety at reference scale —
        config 7's n=10M final confirmation is 1e14 values). The chunked
        result must match the single-call evaluation to rounding."""
        import rlaopt_tpu.models.linsys as linsys_mod
        from rlaopt_tpu.kernels import KernelConfig, RBFLinOp

        n, d, k = 512, 5, 2
        ka, kb, kw = jax.random.split(key, 3)
        X = jax.random.normal(ka, (n, d), dtype=jnp.float32)
        A = RBFLinOp(X, X, KernelConfig(lengthscale=2.0))
        B = jax.random.normal(kb, (n, k), dtype=jnp.float32)
        W = jax.random.normal(kw, (n, k), dtype=jnp.float32)
        sys_ = LinSys(
            A, B, reg=0.1, A_row_oracle=A.row_oracle,
            A_blk_oracle=A.blk_oracle,
        )
        single = sys_._compute_internal_metrics(W, force_true=True)
        # force the chunked path: budget of 100·n values → ~6 row blocks
        monkeypatch.setattr(
            linsys_mod, "_TRUE_RESID_CHUNK_VALUES", 100.0 * n
        )
        chunked = sys_._compute_internal_metrics(W, force_true=True)
        assert jnp.allclose(
            chunked["abs_res"], single["abs_res"], rtol=1e-5
        ), (chunked, single)
        assert jnp.allclose(
            chunked["rel_res"], single["rel_res"], rtol=1e-5
        )

    def test_sampled_requires_row_access(self, key):
        from rlaopt_tpu.linops import LinOp as _L

        A, B = make_spd_system(key, 64, 1, jnp.float32)
        op = _L((64, 64), matvec=lambda x: A @ x, dtype=jnp.float32)
        cfg = PCGConfig(
            max_iters=5, precond_config=NystromConfig(rank=16, rho=1e-3)
        )
        with pytest.raises(ValueError, match="sampled"):
            LinSys(op, B, reg=1e-3).solve(
                cfg, jnp.zeros_like(B), key=key, metrics="sampled"
            )

    def test_bad_metrics_value(self, key):
        A, B = make_spd_system(key, 64, 1, jnp.float32)
        cfg = PCGConfig(max_iters=5, precond_config=NystromConfig(rank=16, rho=1e-3))
        with pytest.raises(ValueError, match="metrics"):
            LinSys(A, B, reg=1e-3).solve(
                cfg, jnp.zeros_like(B), key=key, metrics="fast"
            )

    def test_sap_falls_back_to_true(self, key):
        """SAP carries no residual: recurrence request degrades gracefully."""
        from rlaopt_tpu.solvers import SAPConfig

        A, B = make_spd_system(key, 64, 1, jnp.float32)
        from rlaopt_tpu.linops import aslinop

        row = lambda blk: aslinop(A[blk, :])  # noqa: E731
        blk_o = lambda blk: aslinop(A[blk][:, blk])  # noqa: E731
        cfg = SAPConfig(
            max_iters=10, blk_sz=16, accel=False,
            precond_config=NewtonConfig(rho=1e-3),
        )
        _, log = LinSys(
            A, B, reg=1e-3, A_row_oracle=row, A_blk_oracle=blk_o
        ).solve(cfg, jnp.zeros_like(B), callback_freq=5, key=key,
                metrics="recurrence")
        for entry in log.values():
            assert "source" not in entry["metrics"]["internal_metrics"]


class TestF64Refinement:
    @pytest.mark.parametrize("refine_device", ["cpu", "accel"])
    def test_kernel_krr_refinement_beats_f32_floor(self, key, refine_device):
        """Mixed-precision refinement: f32 solve + f64 residual (host or
        accelerator-streamed) + f32 correction solves reach a TRUE residual
        the plain f32 solve cannot certify (it converges to the
        f32-perturbed operator)."""
        import numpy as np

        from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n, d = 512, 4
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        y = jax.random.normal(kb, (n,), dtype=jnp.float32)
        reg = 1e-3 * n
        K = RBFLinOp(X, X, KernelConfig(lengthscale=float(d) ** 0.5))
        cfg = PCGConfig(
            max_iters=60, rtol=1e-9,
            precond_config=NystromConfig(rank=128, rho=float(reg)),
        )
        sys_ = LinSys(K, y, reg=float(reg))
        W64, log = sys_.solve(
            cfg, jnp.zeros((n, 1), jnp.float32), callback_freq=20, key=key,
            f64_refine_rounds=2, f64_refine_device=refine_device,
        )
        assert W64.dtype == np.float64
        hist = log["f64_refine"]["rel_res_f64"]
        assert len(hist) >= 2
        # refinement strictly reduces the TRUE residual and ends tiny
        assert max(hist[-1]) < max(hist[0])
        assert max(hist[-1]) < 1e-7

    def test_refinement_updated_residual_modes(self, key):
        """Round 4: ``f64_refine_residual="update"`` replaces per-round
        value64 re-evaluation with ``R ← R − (Aδ + reg·δ)`` (compensated
        exact-f32 Aδ). With a correction target well above the value64
        evaluation floor, the updated claim must agree with an
        independent host-f64 recomputation; the default "evaluate" mode
        must stay certification-grade even when driven to the floor."""
        import numpy as np

        from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n, d = 384, 6
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        y = jax.random.normal(kb, (n,), dtype=jnp.float32)
        reg = 1e-3 * n
        ls = float(d) ** 0.5
        X64 = np.asarray(X, np.float64) / ls
        d2 = (
            (X64**2).sum(1)[:, None] + (X64**2).sum(1)[None, :]
            - 2.0 * X64 @ X64.T
        )
        K64 = np.exp(-0.5 * np.maximum(d2, 0.0))
        y64 = np.asarray(y, np.float64)[:, None]

        def true_rel(W64):
            R = y64 - (K64 @ W64 + float(reg) * W64)
            return float(np.linalg.norm(R) / np.linalg.norm(y64))

        K = RBFLinOp(X, X, KernelConfig(lengthscale=ls))
        # "update" with a target (1e-5) ~100x above the value64 floor at
        # this scale: claim and truth agree to the documented grade
        cfg = PCGConfig(
            max_iters=60, rtol=1e-5,
            precond_config=NystromConfig(rank=96, rho=float(reg)),
        )
        W64, log = LinSys(K, y, reg=float(reg)).solve(
            cfg, jnp.zeros((n, 1), jnp.float32), callback_freq=20, key=key,
            f64_refine_rounds=1, f64_refine_device="accel",
            f64_refine_residual="update",
        )
        claimed = max(log["f64_refine"]["rel_res_f64"][-1])
        t = true_rel(W64)
        assert claimed <= 1e-5
        assert abs(claimed - t) < 2e-7 + 0.1 * t, (claimed, t)
        # Round 5 (ADVICE r4): an update-sourced final claim carries an
        # in-library guard — an independent host-sampled exact-f64 check,
        # recorded in the log. (If the solve converged at an evaluated
        # round, no update happened and no guard is needed; the hybrid
        # test exercises the guard-present path.)
        if log["f64_refine"]["residual_sources"][-1] == "update":
            chk = log["f64_refine"]["update_check"]
            assert chk["refreshed"] in (True, False)
            assert max(chk["sampled_rel"]) < 1.6 * max(
                chk["claim_rel"]
            ) + 1e-9 or chk["refreshed"]

        # default "evaluate" driven far below the value64 floor: the
        # reported residual is the EVALUATED system's (it can undershoot
        # the true one once below ~3e-9·amplification — here the RBF row
        # sums amplify to ~1e-7·‖y‖; certification at such targets needs
        # the independent verification the north-star capture carries).
        # What must hold: the true residual lands AT that floor — i.e.
        # refinement genuinely reached the evaluation-accuracy limit —
        # and both modes' true residuals agree at the floor grade.
        cfg2 = PCGConfig(
            max_iters=60, rtol=1e-9,
            precond_config=NystromConfig(rank=96, rho=float(reg)),
        )
        W64e, loge = LinSys(K, y, reg=float(reg)).solve(
            cfg2, jnp.zeros((n, 1), jnp.float32), callback_freq=20, key=key,
            f64_refine_rounds=2, f64_refine_device="accel",
        )
        claimed_e = max(loge["f64_refine"]["rel_res_f64"][-1])
        t_e = true_rel(W64e)
        assert claimed_e < 1e-9  # evaluated-system residual: converged
        assert t_e < 5e-7, t_e  # true residual: at the value64 floor

    def test_refinement_hybrid_mode(self, key):
        """Round 5: ``f64_refine_residual="hybrid"`` steers the first
        correction off a compensated exact-f32 residual and certifies
        with a full value64 evaluation on the next round — the claim
        grade must match plain "evaluate" while skipping the first
        value64 sweep."""
        import numpy as np

        from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n, d = 384, 6
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        y = jax.random.normal(kb, (n,), dtype=jnp.float32)
        reg = 1e-3 * n
        ls = float(d) ** 0.5
        K = RBFLinOp(X, X, KernelConfig(lengthscale=ls))
        cfg = PCGConfig(
            max_iters=60, rtol=1e-6,
            precond_config=NystromConfig(rank=96, rho=float(reg)),
        )
        W64, log = LinSys(K, y, reg=float(reg)).solve(
            cfg, jnp.zeros((n, 1), jnp.float32), callback_freq=20, key=key,
            f64_refine_rounds=2, f64_refine_device="accel",
            f64_refine_residual="hybrid",
        )
        ref = log["f64_refine"]
        srcs = ref["residual_sources"]
        assert srcs[0] == "compensated_f32", srcs
        # a full value64 evaluation happened after the cheap round (the
        # certifying sweep); the final claim is never cheap-sourced, and
        # an update-sourced final claim carries the sampled-f64 guard
        assert "evaluate" in srcs[1:], srcs
        assert srcs[-1] in ("evaluate", "update"), srcs
        if srcs[-1] == "update":
            assert ref["update_check"]["refreshed"] in (True, False)
        # truth check: host f64
        X64 = np.asarray(X, np.float64) / ls
        d2 = (
            (X64**2).sum(1)[:, None] + (X64**2).sum(1)[None, :]
            - 2.0 * X64 @ X64.T
        )
        K64 = np.exp(-0.5 * np.maximum(d2, 0.0))
        y64 = np.asarray(y, np.float64)[:, None]
        R = y64 - (K64 @ W64 + float(reg) * W64)
        t = float(np.linalg.norm(R) / np.linalg.norm(y64))
        claimed = max(ref["rel_res_f64"][-1])
        assert claimed <= 1e-6
        assert t <= 1.2e-6, t  # truth agrees with the certified claim
        # hybrid must not raise on a non-kernel operand route check
        with pytest.raises(ValueError, match="hybrid"):
            A = jax.random.normal(kx, (64, 64), dtype=jnp.float32)
            A = A @ A.T + jnp.eye(64, dtype=jnp.float32)
            LinSys(A, y[:64], reg=1.0).solve(
                PCGConfig(max_iters=5, rtol=1e-4),
                jnp.zeros((64, 1), jnp.float32), key=key,
                f64_refine_rounds=1, f64_refine_device="accel",
                f64_refine_residual="hybrid",
            )

    def test_refinement_sampled_certificate(self, key):
        """Round 5: hybrid + f64_refine_certify="sampled" certifies with
        the sampled value64 estimate plus an independent host-f64 second
        opinion instead of the full sweep; the claim must agree with the
        host-f64 truth at the certificate's noise grade."""
        import numpy as np

        from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n, d = 400, 6
        kx, kb = jax.random.split(key)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        y = jax.random.normal(kb, (n,), dtype=jnp.float32)
        reg = 1e-3 * n
        ls = float(d) ** 0.5
        K = RBFLinOp(X, X, KernelConfig(lengthscale=ls))
        cfg = PCGConfig(
            max_iters=60, rtol=1e-5,
            precond_config=NystromConfig(rank=96, rho=float(reg)),
        )
        W64, log = LinSys(K, y, reg=float(reg)).solve(
            cfg, jnp.zeros((n, 1), jnp.float32), callback_freq=20, key=key,
            f64_refine_rounds=2, f64_refine_device="accel",
            f64_refine_residual="hybrid", f64_refine_certify="sampled",
        )
        ref = log["f64_refine"]
        srcs = ref["residual_sources"]
        # the certificate fired (s=n here: the sampled estimate is exact)
        assert "value64_sampled" in srcs, srcs
        cert = ref["sampled_certificate"]
        assert cert["refreshed"] is False, cert
        # truth agrees with the claim
        X64 = np.asarray(X, np.float64) / ls
        d2 = (
            (X64**2).sum(1)[:, None] + (X64**2).sum(1)[None, :]
            - 2.0 * X64 @ X64.T
        )
        K64 = np.exp(-0.5 * np.maximum(d2, 0.0))
        y64 = np.asarray(y, np.float64)[:, None]
        R = y64 - (K64 @ W64 + float(reg) * W64)
        t = float(np.linalg.norm(R) / np.linalg.norm(y64))
        claim = max(cert["claim_rel"])
        assert t <= 1.1e-5, t
        assert abs(claim - t) <= 0.2 * t + 1e-9, (claim, t)
        # sampled certify without hybrid is rejected
        with pytest.raises(ValueError, match="sampled"):
            LinSys(K, y, reg=float(reg)).solve(
                cfg, jnp.zeros((n, 1), jnp.float32), key=key,
                f64_refine_rounds=1, f64_refine_device="accel",
                f64_refine_certify="sampled",
            )

    def test_sampled_f64_residual_estimator(self, key):
        """The update-mode guard's measuring tool: the host-sampled f64
        residual estimate is exact at full sampling and unbiased-accurate
        on kernel and dense operands."""
        import numpy as np

        from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
        from rlaopt_tpu.models import LinSys

        n, d, k = 300, 5, 2
        kx, kb, kw = jax.random.split(key, 3)
        X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
        B = jax.random.normal(kb, (n, k), dtype=jnp.float32)
        W64 = np.asarray(
            jax.random.normal(kw, (n, k), dtype=jnp.float32), np.float64
        )
        ls = float(d) ** 0.5
        reg = 1e-2
        K = RBFLinOp(X, X, KernelConfig(lengthscale=ls))
        sys_ = LinSys(K, B, reg=reg)
        est, stderr = sys_._sampled_f64_residual(W64)  # s=n here: exact
        X64 = np.asarray(X, np.float64) / ls
        d2 = (
            (X64**2).sum(1)[:, None] + (X64**2).sum(1)[None, :]
            - 2.0 * X64 @ X64.T
        )
        K64 = np.exp(-0.5 * np.maximum(d2, 0.0))
        R = np.asarray(B, np.float64) - (K64 @ W64 + reg * W64)
        want = np.linalg.norm(R, axis=0)
        np.testing.assert_allclose(np.asarray(est), want, rtol=1e-7)
        # dense operand path
        A = jax.random.normal(kx, (n, n), dtype=jnp.float32)
        sys_d = LinSys(A, B, reg=reg)
        est_d, _ = sys_d._sampled_f64_residual(W64)
        Rd = np.asarray(B, np.float64) - (
            np.asarray(A, np.float64) @ W64 + reg * W64
        )
        np.testing.assert_allclose(
            np.asarray(est_d), np.linalg.norm(Rd, axis=0), rtol=1e-9
        )

    def test_dense_refinement(self, key):
        import numpy as np

        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n = 96
        kq, kb = jax.random.split(key)
        G = jax.random.normal(kq, (n, n), dtype=jnp.float32)
        A = (G @ G.T) / n + jnp.eye(n, dtype=jnp.float32)
        B = jax.random.normal(kb, (n, 2), dtype=jnp.float32)
        cfg = PCGConfig(
            max_iters=50, rtol=1e-9,
            precond_config=NystromConfig(rank=48, rho=1e-2),
        )
        W64, log = LinSys(A, B, reg=1e-2).solve(
            cfg, jnp.zeros_like(B), callback_freq=10, key=key,
            f64_refine_rounds=2,
        )
        hist = log["f64_refine"]["rel_res_f64"]
        assert max(hist[-1]) < 1e-7
        # f64-verified: residual computed independently here
        R = np.asarray(B, np.float64) - (
            np.asarray(A, np.float64) @ W64 + 1e-2 * W64
        )
        rel = np.linalg.norm(R, axis=0) / np.linalg.norm(
            np.asarray(B, np.float64), axis=0
        )
        assert rel.max() < 1e-7


class TestConfirmBackoff:
    def test_stalled_confirms_back_off_exponentially(self, key):
        """Round 4: when the recurrence estimator keeps contracting below
        rtol but the TRUE residual stalls at the f32-operator floor, the
        confirm sweeps must back off exponentially — at n=1M each one is
        a ~25 s compensated full sweep and the gap logic alone re-fired
        one every 3-4 iterations (~250 s of a 60-iteration solve)."""
        import numpy as np

        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        n = 512
        kq, kb = jax.random.split(key)
        G = jax.random.normal(kq, (n, n), dtype=jnp.float32)
        A = (G @ G.T) / n + jnp.eye(n, dtype=jnp.float32)
        B = jax.random.normal(kb, (n, 1), dtype=jnp.float32)
        sys_ = LinSys(A, B, reg=1e-3)
        confirms = []
        orig = sys_._true_internal_metrics

        def counting(W):
            confirms.append(1)
            return orig(W)

        sys_._true_internal_metrics = counting
        # rtol below the f32 true-residual floor but reachable by the
        # recurrence estimate: every boundary would confirm without backoff
        cfg = PCGConfig(
            max_iters=120, rtol=1e-9,
            precond_config=NystromConfig(rank=128, rho=1e-3),
        )
        sys_.solve(
            cfg, jnp.zeros_like(B), callback_freq=2, key=key,
            metrics="recurrence",
        )
        n_boundaries = 60
        # without backoff: confirms at nearly every boundary once the
        # estimate dips under rtol; with exponential backoff the count is
        # logarithmic-ish. Allow slack for the pre-floor phase.
        assert 1 <= len(confirms) <= 14, len(confirms)

    def test_stall_terminates_early_with_true_residual(self, key):
        """Stalled confirms with the raw estimator far below tolerance
        (ADVICE r4: a bare two-confirm rule was too eager for
        plateau-then-resume spectra) certify the operator floor
        and stop the solve early — with TRUE (source-free) final metrics
        and the ``stalled`` marker, never a false convergence claim."""
        from rlaopt_tpu.models import LinSys
        from rlaopt_tpu.preconditioners import NystromConfig
        from rlaopt_tpu.solvers import PCGConfig

        A, B = make_spd_system(key, 128, 2, jnp.float32)
        reg = 1e-4
        # unreachable target: this f32 problem floors at ~4e-5.
        # max_iters sized so the THIRD stalled confirm (round 5: three
        # required, with exponential backoff between attempts) can fire.
        cfg = PCGConfig(
            max_iters=300, rtol=1e-7,
            precond_config=NystromConfig(rank=48, rho=reg),
        )
        sys_ = LinSys(A, B, reg=reg)
        W, log = sys_.solve(
            cfg, jnp.zeros_like(B), callback_freq=10, key=key,
            metrics="recurrence",
        )
        last = max(i for i in log if isinstance(i, int))
        fin = log[last]["metrics"]["internal_metrics"]
        assert last < 300  # stopped before max_iters
        assert fin.get("stalled") is True
        # surfaced in the RETURN VALUE too (ADVICE r4), not only metrics
        assert log.get("stalled") is True
        assert sys_.stalled is True
        assert "source" not in fin or fin.get("source") is None
        # the reported residual is the true floor, not the optimistic
        # recurrence estimate (which kept contracting)
        import numpy as np

        A64 = np.asarray(A, np.float64)
        W64 = np.asarray(W, np.float64)
        R = np.asarray(B, np.float64) - (A64 @ W64 + reg * W64)
        true_rel = np.linalg.norm(R, axis=0) / np.linalg.norm(
            np.asarray(B, np.float64), axis=0
        )
        rep = np.asarray(fin["rel_res"], np.float64)
        # grade-level agreement: the confirm evaluates in f32, whose own
        # error at this conditioning is the same order as the floor —
        # the reported value must be AT the floor (within ~2x of f64
        # truth), not the recurrence estimate that contracted far below
        assert np.all((rep > 0.4 * true_rel) & (rep < 2.5 * true_rel)), (
            rep, true_rel,
        )
