"""Spectrum-matched ASkotch stall control (reference vs ours).

The n=1M reference-experiment configuration
(`/root/reference/experiments/distributed_krr_linsys_askotch_solve_test.py:15-55`,
scaled per BASELINE.json configs[3]) has lambda_max/reg ~ 4e7; benchmarks
config 4 observes rel-res ~0.99 after 300 ASkotch iterations and explains
the stall by that spectrum. This script *proves* the explanation with a
reference-side run: a small-n problem (feasible on the CPU-only reference
build) whose lambda_max/reg ratio is matched to the 1M configuration, run
through BOTH the actual PyTorch reference SAP and ours for the same 300
iterations with the experiment's own hyperparameters (blk = n/100, Nystrom
rank 100, mu=reg, nu=100, 10 power iterations, accelerated).

Measured outcome (round 2, recorded in benchmarks/RESULTS_r2.md): the
reference reaches rel-res 0.8266 after 300 iterations (contraction
~0.999196/iter) and ours 0.8118 (~0.999305/iter) — both sides stall far
from 1e-6 at a ~7e-4-per-iteration contraction, so the stall is a property
of the problem spectrum, not of either implementation.

Run:  PYTHONPATH=/tmp/refbuild python benchmarks/askotch_control.py
(the reference must be importable; see tests/parity/conftest.py)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# repo root on sys.path: this script is run as `python benchmarks/...`
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

N = 16_384
D = 50
TARGET_RATIO = 4e7  # lambda_max / reg of the n=1M reference config
ITERS = 300
LOG_EVERY = 25


def build_problem():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, D)).astype(np.float64) / np.sqrt(D)
    y = rng.standard_normal((N, 1)).astype(np.float64)
    sq = (X**2).sum(1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (X @ X.T)
    np.maximum(d2, 0.0, out=d2)
    K = np.exp(-0.5 * d2)  # lengthscale 1, matching the experiment
    # lambda_max by power iteration (K is PSD)
    v = rng.standard_normal(N)
    for _ in range(60):
        v = K @ v
        v /= np.linalg.norm(v)
    lam = float(v @ (K @ v))
    reg = lam / TARGET_RATIO
    return X, y, K, lam, reg


def run_reference(K, y, reg, seed=0):
    import types

    if "wandb" not in sys.modules:
        stub = types.ModuleType("wandb")
        stub.init = lambda **kw: None
        stub.log = lambda *a, **kw: None
        stub.finish = lambda: None
        sys.modules["wandb"] = stub
    import torch

    from rlaopt.models import LinSys
    from rlaopt.preconditioners import NystromConfig
    from rlaopt.solvers import SAPAccelConfig
    from rlaopt.solvers.sap import SAP

    torch.manual_seed(seed)
    # reference components (sketches, powering probes) draw at the default
    # dtype; the control problem is f64
    torch.set_default_dtype(torch.float64)
    Kt = torch.from_numpy(K)
    yt = torch.from_numpy(y)
    sys_t = LinSys(
        Kt,
        yt,
        reg=reg,
        A_row_oracle=lambda blk: Kt[blk, :],
        A_blk_oracle=lambda blk: Kt[blk][:, blk],
    )
    solver = SAP(
        system=sys_t,
        W_init=torch.zeros_like(yt),
        precond_config=NystromConfig(rank=100, rho=reg),
        device=torch.device("cpu"),
        blk_sz=N // 100,
        accel=True,
        accel_config=SAPAccelConfig(mu=reg, nu=100.0),
        power_iters=10,
    )
    y_norm = float(np.linalg.norm(y))
    traj = {}
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        solver._step()
        if i % LOG_EVERY == 0 or i == 1:
            W = solver.W.numpy()
            rel = float(np.linalg.norm(y - (K @ W + reg * W)) / y_norm)
            traj[i] = rel
    wall = time.perf_counter() - t0
    return traj, wall


def run_ours(X, y, reg, seed=0):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import SAPAccelConfig, SAPConfig

    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)
    K = RBFLinOp(Xj, Xj, KernelConfig(lengthscale=1.0))
    sys_ = LinSys(
        K, yj, reg=float(reg), A_row_oracle=K.row_oracle,
        A_blk_oracle=K.blk_oracle,
    )
    cfg = SAPConfig(
        max_iters=ITERS, rtol=1e-12, blk_sz=N // 100,
        precond_config=NystromConfig(rank=100, rho=float(reg)),
        accel=True, accel_config=SAPAccelConfig(mu=float(reg), nu=100.0),
        power_iters=10,
    )
    t0 = time.perf_counter()
    _, log = sys_.solve(
        cfg, jnp.zeros_like(yj), callback_freq=LOG_EVERY,
        key=jax.random.PRNGKey(seed),
    )
    wall = time.perf_counter() - t0
    traj = {
        int(i): float(
            jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"])
        )
        for i in sorted(k for k in log if isinstance(k, int))
    }
    return traj, wall


def contraction(traj):
    its = sorted(traj)
    i0, i1 = its[0], its[-1]
    if traj[i0] <= 0 or i1 == i0:
        return None
    return (traj[i1] / traj[i0]) ** (1.0 / (i1 - i0))


def main():
    X, y, K, lam, reg = build_problem()
    ref_traj, ref_wall = run_reference(K, y, reg)
    ours_traj, ours_wall = run_ours(X, y, reg)
    out = {
        "benchmark": "askotch_spectrum_matched_control",
        "n": N,
        "d": D,
        "lambda_max": lam,
        "reg": reg,
        "lambda_max_over_reg": lam / reg,
        "iters": ITERS,
        "reference": {
            "rel_trajectory": {k: round(v, 6) for k, v in ref_traj.items()},
            "rel_res_final": ref_traj[max(ref_traj)],
            "contraction_per_iter": contraction(ref_traj),
            "wall_s": round(ref_wall, 1),
        },
        "ours": {
            "rel_trajectory": {k: round(v, 6) for k, v in ours_traj.items()},
            "rel_res_final": ours_traj[max(ours_traj)],
            "contraction_per_iter": contraction(ours_traj),
            "wall_s": round(ours_wall, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
