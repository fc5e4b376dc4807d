"""Benchmark harness: the five BASELINE.json configs.

Each config prints one JSON line with wall-clock and accuracy numbers.
Run:  python benchmarks/run.py --config N  (N in 1..5, default: all)

Configs 3/5 load the real UCI HIGGS dataset via benchmarks/datasets.py
(download + checksum + cache); in offline environments they fall back to a
shape-matched synthetic surrogate and report dataset="synthetic".
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_benchcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(x):
    """Force execution on the tunneled TPU runtime (scalar fetch)."""
    return float(jnp.sum(jnp.asarray(x)))


def _result(name, wall, extra):
    print(json.dumps({"benchmark": name, "wall_s": round(wall, 3), **extra}))


def config1_nystrom_pcg_cpu():
    """Nyström-PCG on synthetic 4096² ill-conditioned SPD, fp64, CPU."""
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        n, rank = 4096, 200
        key = jax.random.PRNGKey(0)
        kq, kb = jax.random.split(key)
        Q, _ = jnp.linalg.qr(
            jax.random.normal(kq, (n, n), dtype=jnp.float64)
        )
        eigs = jnp.arange(1, n + 1, dtype=jnp.float64) ** -2.0
        A = (Q * eigs) @ Q.T
        A = (A + A.T) / 2
        B = jax.random.normal(kb, (n, 5), dtype=jnp.float64)
        reg = 1e-8
        sys_ = LinSys(A, B, reg=reg)
        cfg = PCGConfig(
            max_iters=500, rtol=1e-6,
            precond_config=NystromConfig(rank=rank, rho=reg, sketch="gauss"),
        )
        t0 = time.perf_counter()
        W, log = sys_.solve(cfg, jnp.zeros_like(B), callback_freq=10, key=key)
        _sync(W)
        wall = time.perf_counter() - t0
        it = max(log.keys())
        rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    _result("nystrom_pcg_4096_fp64_cpu", wall, {"iters": it, "rel_res": rel})


def config2_srht_lsqr():
    """Sketch-and-precondition LSQR, 100k×1k overdetermined, SRHT sketch."""
    from rlaopt_tpu.models import LstSq
    from rlaopt_tpu.preconditioners import SkPreConfig
    from rlaopt_tpu.solvers import LSQRConfig

    m, n = 100_000, 1_000
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    A = jax.random.normal(ka, (m, n), dtype=jnp.float32)
    A = A * jnp.logspace(0, -4, n, dtype=jnp.float32)[None, :]
    b = jax.random.normal(kb, (m,), dtype=jnp.float32)
    model = LstSq(A, b)
    cfg = LSQRConfig(
        max_iters=100, rtol=1e-6,
        precond_config=SkPreConfig(sketch_size=4 * n, rho=0.0, sketch="srht"),
    )
    t0 = time.perf_counter()
    W, log = model.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=5, key=key
    )
    _sync(W)
    wall = time.perf_counter() - t0
    it = max(log.keys())
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    _result("srht_lsqr_100k_x_1k", wall, {"iters": it, "nrm_eq_rel_res": rel})


def _higgs(n):
    """Real HIGGS rows when downloadable/cached; synthetic surrogate
    otherwise. Returns (X, y, source) — source is reported in results."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from datasets import load_higgs

    X, y, source = load_higgs(n)
    return jnp.asarray(X), jnp.asarray(y), source


def config3_krr_pcg():
    """RBF KRR at HIGGS-100k scale: matrix-free Gram + Nyström PCG."""
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig

    n = 100_000
    key = jax.random.PRNGKey(0)
    X, y, source = _higgs(n)
    reg = 1e-4 * n
    K = RBFLinOp(X, X, KernelConfig(lengthscale=28.0**0.5))
    sys_ = LinSys(K, y, reg=float(reg))
    cfg = PCGConfig(
        max_iters=200, rtol=1e-6,
        precond_config=NystromConfig(rank=500, rho=float(reg)),
    )
    t0 = time.perf_counter()
    W, log = sys_.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=20, key=key
    )
    _sync(W)
    wall = time.perf_counter() - t0
    it = max(log.keys())
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    _result(
        "rbf_krr_higgs100k_pcg", wall,
        {"iters": it, "rel_res": rel, "dataset": source},
    )


def config4_askotch_1m():
    """ASkotch block-coordinate KRR at n=1M with per-block Nyström."""
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import SAPAccelConfig, SAPConfig

    # Mirrors the reference experiment's setup at 1/10 scale
    # (experiments/distributed_krr_linsys_askotch_solve_test.py: data /√d,
    # lengthscale 1.0, reg=1e-2, mu=reg, nu=100).
    n, d = 1_000_000, 50
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32) / d**0.5
    y = jax.random.normal(kb, (n,), dtype=jnp.float32)
    reg = 1e-2
    blk_sz = n // 100
    K = RBFLinOp(X, X, KernelConfig(lengthscale=1.0))
    sys_ = LinSys(
        K, y, reg=float(reg), A_row_oracle=K.row_oracle,
        A_blk_oracle=K.blk_oracle,
    )
    cfg = SAPConfig(
        max_iters=300, rtol=1e-6, blk_sz=blk_sz,
        precond_config=NystromConfig(rank=100, rho=float(reg)),
        accel=True,
        accel_config=SAPAccelConfig(mu=float(reg), nu=100.0),
        power_iters=10,
    )
    t0 = time.perf_counter()
    W, log = sys_.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=25, key=key
    )
    _sync(W)
    wall = time.perf_counter() - t0
    it = max(log.keys())
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    # ASkotch touches 1% of coordinates per iteration; full convergence takes
    # thousands of iterations (the reference's 300-iteration experiment is a
    # scale test, not a convergence run). Track throughput + progress.
    _result(
        "askotch_krr_1m", wall,
        {"iters": it, "rel_res": rel, "iters_per_s": round(it / wall, 2)},
    )


def config5_sharded_krr():
    """Sharded-mesh KRR: collective matvecs + Lanczos/Hutchinson estimators.

    Uses whatever devices exist (a v5p-8 mesh in the target deployment; a
    single chip or the 8-virtual-CPU mesh here).
    """
    from rlaopt_tpu.kernels import KernelConfig, ShardedRBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.parallel import make_mesh
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig
    from rlaopt_tpu.spectral_estimators import hutchinson, lanczos_eigsh

    n = 50_000
    key = jax.random.PRNGKey(0)
    X, y, source = _higgs(n)
    mesh = make_mesh()
    reg = 1e-4 * n
    K = ShardedRBFLinOp(X, X, KernelConfig(lengthscale=28.0**0.5), mesh=mesh)
    t0 = time.perf_counter()
    lam = float(lanczos_eigsh(K, num_iters=20, key=key)[-1])
    tr, _ = hutchinson(K, 32, "gauss", key)
    sys_ = LinSys(K, y, reg=float(reg))
    cfg = PCGConfig(
        max_iters=50, rtol=1e-6,
        precond_config=NystromConfig(rank=200, rho=float(reg)),
    )
    W, log = sys_.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=10, key=key
    )
    _sync(W)
    wall = time.perf_counter() - t0
    it = max(log.keys())
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    _result(
        "sharded_krr_50k",
        wall,
        {
            "devices": len(mesh.devices.flatten()),
            "iters": it,
            "rel_res": rel,
            "lambda_max": lam,
            "trace_est": float(tr),
            "dataset": source,
        },
    )


CONFIGS = {
    1: config1_nystrom_pcg_cpu,
    2: config2_srht_lsqr,
    3: config3_krr_pcg,
    4: config4_askotch_1m,
    5: config5_sharded_krr,
}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=None, help="1..5; default all")
    args = p.parse_args()
    todo = [args.config] if args.config else sorted(CONFIGS)
    for c in todo:
        CONFIGS[c]()
