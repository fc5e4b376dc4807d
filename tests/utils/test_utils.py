"""Utils tests: Logger, profiling, RNG chain, checkers."""

import time

import jax
import jax.numpy as jnp
import pytest

from rlaopt_tpu.utils import (
    Logger,
    Profiler,
    _as_key,
    _is_pos_int,
    annotate,
    next_key,
    seed,
)


class TestLogger:
    def test_freq_gating_and_timing(self):
        calls = []

        def log_fn(w):
            calls.append(w)
            return {"metric": float(w)}

        lg = Logger(log_freq=3, log_fn=log_fn, wandb_kwargs=None)
        assert lg._compute_log(1, jnp.asarray(1.0)) is None
        assert lg._compute_log(2, jnp.asarray(2.0)) is None
        out = lg._compute_log(3, jnp.asarray(3.0))
        assert out is not None
        assert out["metrics"]["metric"] == 3.0
        assert out["iter_time"] >= 0 and out["cum_time"] >= out["iter_time"]
        assert len(calls) == 1
        lg._terminate()  # no wandb: no-op

    def test_cumulative_time_monotone(self):
        lg = Logger(log_freq=1, log_fn=lambda w: {}, wandb_kwargs=None)
        a = lg._compute_log(1, jnp.asarray(0.0))
        time.sleep(0.01)
        b = lg._compute_log(2, jnp.asarray(0.0))
        assert b["cum_time"] > a["cum_time"]


class TestProfiler:
    def test_phase_accumulation(self):
        prof = Profiler()
        with prof.phase("a"):
            time.sleep(0.01)
        with prof.phase("a"):
            time.sleep(0.01)
        with prof.phase("b") as out:
            out["sync"] = jnp.ones(3) * 2
        s = prof.summary()
        assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0.02
        assert s["b"]["count"] == 1
        prof.reset()
        assert prof.summary() == {}

    def test_annotate_context(self):
        with annotate("phase-x"):
            _ = jnp.ones(3) + 1


class TestRng:
    def test_seed_reproducible(self):
        seed(42)
        k1 = next_key()
        k2 = next_key()
        seed(42)
        k1b = next_key()
        assert jnp.array_equal(
            jax.random.key_data(k1), jax.random.key_data(k1b)
        )
        assert not jnp.array_equal(
            jax.random.key_data(k1), jax.random.key_data(k2)
        )

    def test_as_key_coercions(self):
        k = _as_key(None)
        assert _as_key(7) is not None
        assert _as_key(k) is k
        with pytest.raises(TypeError):
            _as_key("nope")


class TestCheckers:
    def test_pos_int(self):
        _is_pos_int(3, "x")
        with pytest.raises(ValueError):
            _is_pos_int(0, "x")
        with pytest.raises(TypeError):
            _is_pos_int(1.5, "x")
        with pytest.raises(TypeError):
            _is_pos_int(True, "x")


class TestLoggerWandb:
    def test_wandb_plumbing(self, monkeypatch):
        import sys, types

        calls = {"init": None, "log": [], "finish": 0}
        stub = types.ModuleType("wandb")
        stub.init = lambda **kw: calls.__setitem__("init", kw)
        stub.log = lambda d, step=None: calls["log"].append((step, d))
        stub.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
        monkeypatch.setitem(sys.modules, "wandb", stub)

        lg = Logger(
            log_freq=2,
            log_fn=lambda w: {"m": 1},
            wandb_kwargs={"project": "p", "config": {"a": 1}},
        )
        assert calls["init"]["project"] == "p"
        lg._compute_log(2, jnp.asarray(0.0))
        assert calls["log"][0][0] == 2
        lg._terminate()
        assert calls["finish"] == 1


class TestTraceContext:
    def test_profiler_trace(self, tmp_path):
        from rlaopt_tpu.utils import trace

        with trace(str(tmp_path / "tr")):
            _ = (jnp.ones(8) * 2).sum()
        assert any((tmp_path / "tr").rglob("*"))
