"""Checkpoint/resume tests (TPU-addition subsystem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.models import LinSys
from rlaopt_tpu.preconditioners import NystromConfig
from rlaopt_tpu.solvers import PCGConfig
from rlaopt_tpu.utils.checkpoint import SolveCheckpointer


@pytest.fixture
def problem(key):
    n, k = 80, 2
    kq, kb = jax.random.split(key)
    Q, _ = jnp.linalg.qr(jax.random.normal(kq, (n, n), dtype=jnp.float64))
    eigs = jnp.logspace(0, -4, n)
    A = (Q * eigs) @ Q.T
    A = (A + A.T) / 2
    B = jax.random.normal(kb, (n, k), dtype=jnp.float64)
    return A, B


def test_checkpointer_roundtrip(tmp_path):
    ck = SolveCheckpointer(str(tmp_path / "ck"))
    payload = {
        "state": {"W": jnp.arange(6.0).reshape(3, 2)},
        "mask": jnp.asarray([True, False]),
    }
    ck.save(10, payload)
    ck.save(20, payload)
    assert ck.latest_step() == 20
    restored, step = ck.restore(like=payload)
    assert step == 20
    assert np.allclose(restored["state"]["W"], payload["state"]["W"])
    assert np.array_equal(restored["mask"], payload["mask"])


def test_solve_checkpoint_and_resume(problem, key, tmp_path):
    A, B = problem
    reg = 1e-6
    ckdir = str(tmp_path / "solve_ck")
    cfg = PCGConfig(
        max_iters=8, rtol=1e-14,
        precond_config=NystromConfig(rank=60, rho=reg),
    )
    sys1 = LinSys(A, B, reg=reg)
    W_partial, log1 = sys1.solve(
        cfg, jnp.zeros_like(B), callback_freq=2, key=key,
        checkpoint_dir=ckdir, checkpoint_freq=1,
    )
    ck = SolveCheckpointer(ckdir)
    assert ck.latest_step() == 8

    # Resume and run further; must continue from iteration 8
    cfg2 = PCGConfig(
        max_iters=60, rtol=1e-8,
        precond_config=NystromConfig(rank=60, rho=reg),
    )
    sys2 = LinSys(A, B, reg=reg)
    W_final, log2 = sys2.solve(
        cfg2, jnp.zeros_like(B), callback_freq=2, key=key,
        checkpoint_dir=ckdir, resume=True,
    )
    # Log continuity: the resumed run's log includes the pre-checkpoint
    # history (restored from the aux sidecar) plus the new iterations.
    assert min(log2.keys()) == 0
    assert 8 in log2 and max(log2.keys()) > 8
    # Timing continuity: cumulative wall-clock keeps accumulating across the
    # resume instead of restarting from zero.
    assert log2[8]["cum_time"] >= log1[8]["cum_time"]
    it = max(log2.keys())
    rel = float(jnp.max(log2[it]["metrics"]["internal_metrics"]["rel_res"]))
    assert rel < 1e-7
