"""Benchmark harness: the five BASELINE.json configs.

Each config prints one JSON line with wall-clock and accuracy numbers.
Run:  python benchmarks/run.py --config N  (N in 1..7; default: 1..6).
Config 7 is the reference's full n=10M headline experiment (~1 h on one
chip) and only runs when explicitly requested.

Configs 3/5 load the real UCI HIGGS dataset via benchmarks/datasets.py
(download + checksum + cache); in offline environments they fall back to a
shape-matched synthetic surrogate and report dataset="synthetic".
"""

import argparse
import json
import os
import sys
import time

# repo root on sys.path: this script is run as `python benchmarks/run.py`
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

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
        it = max(i for i in log.keys() if isinstance(i, int))
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
    it = max(i for i in log.keys() if isinstance(i, int))
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


def _f64_residual(X, y, W, reg, lengthscale, row_block=512):
    """True residual vector of the KRR solve, evaluated in f64 on the host.

    Streams K row-blocks so the n×n kernel matrix never materializes. This
    is the arbiter for sub-1e-6 claims: an f32 solve — with ANY reporting
    trick — converges to the solution of the f32-perturbed kernel, whose
    true residual floors at the f32 kernel-VALUE error (~3e-7 per entry).
    """
    import numpy as np

    X64 = np.asarray(X, np.float64) / float(lengthscale)
    y64 = np.asarray(y, np.float64).reshape(-1)
    W64 = np.asarray(W, np.float64).reshape(-1)
    n = X64.shape[0]
    r = np.empty(n, np.float64)
    sq = (X64**2).sum(1)
    for s in range(0, n, row_block):
        e = min(s + row_block, n)
        d2 = (
            sq[s:e, None] + sq[None, :] - 2.0 * (X64[s:e] @ X64.T)
        )
        np.maximum(d2, 0.0, out=d2)
        # exp in f64: an earlier f32-exp shortcut ("floor ~1e-7") was
        # measured flooring at 6.9e-6 on the config-8 problem — its
        # ~6e-8 value error rides the kernel row sums, which are
        # problem-dependent. The verifier must out-resolve the claim.
        np.exp(-0.5 * d2, out=d2)
        r[s:e] = d2 @ W64
    return y64 - (r + reg * W64)


def config3_krr_pcg(max_iters=200):
    """RBF KRR at HIGGS-100k scale: matrix-free Gram + Nyström PCG.

    Residuals during the solve use the compensated on-chip metric; the
    final iterate is re-verified in f64 on the host (`f64_rel_res`).
    """
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig

    n = 100_000
    key = jax.random.PRNGKey(0)
    X, y, source = _higgs(n)
    reg = 1e-4 * n
    ls = 28.0**0.5
    K = RBFLinOp(X, X, KernelConfig(lengthscale=ls))
    sys_ = LinSys(K, y, reg=float(reg))
    cfg = PCGConfig(
        max_iters=max_iters, rtol=1e-6,
        precond_config=NystromConfig(rank=500, rho=float(reg)),
    )
    import numpy as np

    t0 = time.perf_counter()
    # Mixed-precision iterative refinement (library feature): the base f32
    # solve converges to the f32-perturbed kernel's solution (true residual
    # ~ kernel-value error x ||W||); refinement re-evaluates the residual in
    # f64 on the host and solves f32 correction systems on-chip.
    # accel refinement: d=28 RBF qualifies for the value64 path, which at
    # n=100k runs the f64-grade residual in seconds vs minutes of host f64
    # exp; the correction solves reuse the base solve's Nyström factor.
    W64, log = sys_.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=20, key=key,
        f64_refine_rounds=2, f64_refine_device="accel",
    )
    wall = time.perf_counter() - t0
    it = max(i for i in log.keys() if isinstance(i, int))
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))
    hist = log["f64_refine"]["rel_res_f64"]

    # Independent verification (streamed numpy, not the library path).
    y_norm = float(np.linalg.norm(np.asarray(y, np.float64)))
    r64 = _f64_residual(X, y, W64.reshape(-1, 1), float(reg), ls)
    rel64 = float(np.linalg.norm(r64) / y_norm)
    _result(
        "rbf_krr_higgs100k_pcg", wall,
        {
            "iters": it,
            "rel_res_onchip_f32": rel,
            "rel_res_f64_per_round": [float(max(h)) for h in hist],
            "rel_res_independently_verified": rel64,
            "dataset": source,
        },
    )


def config4_askotch_1m(max_iters=1000, compute_dtype="bf16x3"):
    """ASkotch block-coordinate KRR at n=1M with per-block Nyström.

    Reference experiment setup at 1/10 scale
    (``experiments/distributed_krr_linsys_askotch_solve_test.py``: data /√d,
    lengthscale 1.0, reg=1e-2, mu=reg, nu=100, blk=n/100, rank 100).

    Reports steady-state iteration throughput (block-coordinate step time,
    excluding the full n×n residual evaluations that only happen on logging
    rounds and excluding compilation) alongside overall wall, plus a
    measured per-100-iteration contraction factor and its extrapolation to
    1e-6 — ASkotch touches 1% of coordinates per iteration, so a full
    convergence run takes far longer than any fixed-iteration benchmark
    (the reference's own 300-iteration experiment is a scale test). See
    benchmarks/ASKOTCH_CALIBRATION.md for the A100 comparison model.
    """
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import SAPAccelConfig, SAPConfig

    n, d = 1_000_000, 50
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32) / d**0.5
    y = jax.random.normal(kb, (n,), dtype=jnp.float32)
    reg = 1e-2
    blk_sz = n // 100
    K = RBFLinOp(
        X, X, KernelConfig(lengthscale=1.0), compute_dtype=compute_dtype
    )
    sys_ = LinSys(
        K, y, reg=float(reg), A_row_oracle=K.row_oracle,
        A_blk_oracle=K.blk_oracle,
    )
    cfg = SAPConfig(
        max_iters=max_iters, rtol=1e-6, blk_sz=blk_sz,
        precond_config=NystromConfig(rank=100, rho=float(reg)),
        accel=True,
        accel_config=SAPAccelConfig(mu=float(reg), nu=100.0),
        power_iters=10,
    )
    t0 = time.perf_counter()
    # metrics="sampled": a FULL residual at n=1M is exp-bound (~14 s
    # compensated — 2x the cost of the 100 block-coordinate iterations it
    # gates); the unbiased 4096-row estimator logs the same trajectory at
    # ~1% standard error and ~0.1 s per boundary, with the final entry
    # always true-evaluated by the model layer.
    W, log = sys_.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=100, key=key,
        metrics="sampled",
    )
    _sync(W)
    wall = time.perf_counter() - t0

    its = sorted(log.keys())
    rels = [
        float(jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"]))
        for i in its
    ]
    it = its[-1]
    # Steady-state step time: iteration chunks only (iter_time minus the
    # logging-round residual evaluation is not separable post hoc, so use
    # the median chunk wall divided by chunk length — residual eval is a
    # constant add-on per chunk and is reported separately via rounds).
    chunk_walls = [log[i]["iter_time"] for i in its[1:]]
    med_chunk = sorted(chunk_walls)[len(chunk_walls) // 2] if chunk_walls else 0
    # Per-100-iteration contraction over the measured tail, extrapolated.
    rho = (rels[-1] / rels[1]) ** (1.0 / max(it - its[1], 1)) if len(rels) > 2 else 1.0
    need = (
        int(jnp.log(1e-6 / rels[-1]) / jnp.log(rho)) + it
        if 0 < rho < 1 else None
    )
    _result(
        "askotch_krr_1m", wall,
        {
            "iters": it,
            "rel_res": rels[-1],
            "rel_trajectory": {i: round(r, 6) for i, r in zip(its, rels)},
            "iters_per_s_overall": round(it / wall, 2),
            "s_per_100iter_chunk_incl_resid": round(med_chunk, 1),
            "contraction_per_iter": round(float(rho), 6),
            "extrapolated_iters_to_1e-6": need,
            "compute_dtype": compute_dtype,
        },
    )


def _f64_residual_sampled(X, y, W, reg, lengthscale, s=4096, seed=7):
    """Unbiased f64 estimate of the KRR relative residual from s sampled rows.

    The full n-row f64 residual is infeasible on a thin host at n=1M
    (~1e14 flops); s uniformly sampled rows give an unbiased estimator of
    ``||r||^2`` (E[n/s * sum r_i^2] = ||r||^2) with relative standard error
    ~ 1/sqrt(2s) under row-exchangeability — reported alongside. Pure
    numpy, independent of every library code path.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = X.shape[0]
    idx = np.sort(rng.choice(n, size=s, replace=False))
    X64 = np.asarray(X, np.float64) / float(lengthscale)
    y64 = np.asarray(y, np.float64).reshape(n, -1)
    W64 = np.asarray(W, np.float64).reshape(n, -1)
    sq = (X64**2).sum(1)
    # stream column blocks: an unchunked (s, n) f64 distance matrix plus
    # its exp/matmul temporaries peaks >100 GB at n=1M and OOMs the host
    kv = np.zeros((s, W64.shape[1]), np.float64)
    blk = 1 << 16
    Xs = X64[idx]
    for c0 in range(0, n, blk):
        c1 = min(c0 + blk, n)
        d2 = sq[idx, None] + sq[None, c0:c1] - 2.0 * (Xs @ X64[c0:c1].T)
        np.maximum(d2, 0.0, out=d2)
        np.exp(-0.5 * d2, out=d2)
        kv += d2 @ W64[c0:c1]
    r = y64[idx] - (kv + reg * W64[idx])
    y_rms = float(np.linalg.norm(y64) / np.sqrt(n))
    r_rms = float(np.linalg.norm(r) / np.sqrt(s))
    rel = r_rms / y_rms
    return rel, rel / np.sqrt(2.0 * s)


def config6_northstar_1m_pcg(max_iters=60):
    """North star, measured: n=1M RBF KRR solved to TRUE rel-res <= 1e-6.

    BASELINE.json: "solve n=1M-point RBF KRR to 1e-6 relative residual ...
    faster than the reference on A100". Config 4 runs the reference
    experiment's ASkotch hyperparameters (whose spectrum legitimately needs
    ~5e5 block-coordinate iterations — see benchmarks/askotch_control.py);
    this config DELIVERS the 1e-6 solve with the toolkit's full pipeline:
    matrix-free Pallas Gram operator + Nystrom PCG + mixed-precision f64
    refinement with accelerator-streamed residuals. The final iterate is
    verified by an independent host-side sampled f64 residual (numpy, no
    library code). Per-iteration A100 calibration: one full KeOps Gram
    matvec at n=1M, d=28, k=1 is n^2*(3d+5+2k) = 9.1e13 flops ~= 7.8 s at
    the 60%-of-fp32-peak credit used in ASKOTCH_CALIBRATION.md; same
    algorithm, same iteration count on both sides.
    """
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig

    n = 1_000_000
    key = jax.random.PRNGKey(0)
    t_data = time.perf_counter()
    X, y, source = _higgs(n)
    t_data = time.perf_counter() - t_data
    reg = 1e-4 * n
    ls = 28.0**0.5
    # bf16x3 operator tier: the refinement certifies the final answer, so
    # base-solve kernel precision is immaterial — take the fast MXU path
    K = RBFLinOp(X, X, KernelConfig(lengthscale=ls), compute_dtype="bf16x3")
    sys_ = LinSys(K, y, reg=float(reg))
    cfg = PCGConfig(
        max_iters=max_iters, rtol=1e-6,
        precond_config=NystromConfig(rank=500, rho=float(reg)),
    )
    t0 = time.perf_counter()
    # Refinement rounds: measured contraction per round is ~1e4x (e.g.
    # 6.8e-5 -> 6.3e-9 at n=4096), so 60 base iterations (~1e-3..1e-4) and
    # a single correction certify well below 1e-6. callback_freq=3 keeps
    # each compiled PCG chunk under the runtime's ~80 s execution watchdog
    # (a 1M matvec is ~15-20 s).
    # residual_mode="update" + certify="sampled" (round 5). The measured
    # facts that picked this configuration (NORTHSTAR_r5_hybrid probe,
    # wall 716 cold / see RESULTS_r5.md): (a) the round-0 STEERING
    # residual must be the full value64 sweep — the compensated exact-f32
    # vector's own error at this problem is ~2.7e-6·||y|| (the
    # cheap-first "hybrid" round read 2.72e-6 and the post-correction
    # truth was 2.79e-6: the correction steered into the measurement
    # error and achieved nothing); (b) the FINAL claim does not need the
    # post-correction compensated update sweep (~23 s) — the sampled
    # value64 certificate (8192 rows at certified value grade, 0.8%
    # noise, 5-sigma margin under 1e-6) plus an independent host-f64
    # sampled second opinion certifies it, and the r5 probe's update
    # claim agreed with the post-hoc full sweep to 5 digits (5.2679e-8
    # vs 5.2676e-8). The full value64 sweep of the DELIVERED solution is
    # still run post-hoc below, outside the timed solve.
    W64, log = sys_.solve(
        cfg, jnp.zeros((n, 1), dtype=jnp.float32), callback_freq=3, key=key,
        f64_refine_rounds=2, f64_refine_device="accel",
        f64_refine_residual="update", f64_refine_certify="sampled",
    )
    wall = time.perf_counter() - t0
    # POST-HOC full-sweep verification (not part of the solve wall): one
    # full value64 evaluation of the delivered solution — the exact-norm
    # number the sampled certificate estimated.
    t_post = time.perf_counter()
    import numpy as np

    d_op = K._data
    from rlaopt_tpu.ops.kernel_value64 import kernel_matmat_value64

    Wh = np.asarray(W64, np.float32)
    Wl = (np.asarray(W64) - Wh).astype(np.float32)
    hi_v, lo_v = kernel_matmat_value64(
        d_op["X1"], d_op["X2"], Wh, d_op["ls"], float(d_op["scale"]),
        kind="rbf",
    )
    hi2_v, lo2_v = kernel_matmat_value64(
        d_op["X1"], d_op["X2"], Wl, d_op["ls"], float(d_op["scale"]),
        kind="rbf",
    )
    KW = (
        np.asarray(hi_v, np.float64) + np.asarray(lo_v, np.float64)
        + np.asarray(hi2_v, np.float64) + np.asarray(lo2_v, np.float64)
    ).reshape(-1, 1)
    y64 = np.asarray(y, np.float64).reshape(-1, 1)
    R_post = y64 - (KW + float(reg) * np.asarray(W64).reshape(-1, 1))
    rel_full_posthoc = float(np.linalg.norm(R_post) / np.linalg.norm(y64))
    posthoc_wall = time.perf_counter() - t_post
    it = max(i for i in log.keys() if isinstance(i, int))
    hist = log["f64_refine"]["rel_res_f64"]
    rel_sampled, stderr = _f64_residual_sampled(X, y, W64, float(reg), ls)
    chunk_walls = [
        log[i]["iter_time"]
        for i in sorted(k for k in log.keys() if isinstance(k, int))
        if i > 0
    ]
    med_chunk = sorted(chunk_walls)[len(chunk_walls) // 2] if chunk_walls else 0
    _result(
        "northstar_1m_krr_pcg_1e-6", wall,
        {
            "iters_base_solve": it,
            "rel_res_f64_per_round": [float(max(h)) for h in hist],
            "rel_res_sampled_independent": rel_sampled,
            "rel_res_sampled_stderr": stderr,
            "rel_res_full_value64_posthoc": rel_full_posthoc,
            "posthoc_full_sweep_wall_s_excl": round(posthoc_wall, 1),
            "certificate": log["f64_refine"].get("sampled_certificate"),
            "s_per_iter_steady_state": round(med_chunk / 3.0, 2),
            "a100_calibrated_s_per_iter": 7.8,
            "dataset": source,
            "phase_walls": {
                "data_gen_excl": round(t_data, 1),
                **sys_.phase_walls,
                "refine": log["f64_refine"].get("phase_walls", {}),
            },
        },
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
    it = max(i for i in log.keys() if isinstance(i, int))
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


def config7_askotch_10m_reference_scale(max_iters=300):
    """The reference's headline experiment at FULL scale, on one chip.

    Exact parameter-for-parameter reproduction of
    ``experiments/distributed_krr_linsys_askotch_solve_test.py:15-55``
    (reference): n=10M, d=50, k=10 RHS, RBF sigma=1.0, data randn/sqrt(d),
    reg=1e-2, Nystrom rank 100 (rho=reg), accel mu=reg nu=100,
    blk=n/100=100k, 300 iterations, fp32 state — which the reference runs
    across THREE CUDA GPUs. Here it runs on a single v5e chip: the row
    oracle streams K[blk,:] (1e12 kernel values per iteration) through the
    Pallas engine, the per-iteration rank-100 block Nystrom rides the MXU,
    and the logging-boundary residual uses the unbiased 4096-row sampled
    estimator (a full n x n residual is 1e14 kernel values).

    callback_freq=5 keeps each compiled SAP chunk (~5 x ~7 s row-oracle
    sweeps) under the runtime's ~80 s execution watchdog.

    A quirk of the reference's own hyperparameters, verified numerically
    at small n (accel vs plain iterates agree to f32 noise, 1.2e-6 after
    60 iterations): mu·nu = 1e-2·100 = 1 makes gamma = 1/sqrt(mu·nu) = 1,
    and the acceleration recurrence then keeps V = Y = W invariant from
    W0 (V' = beta·V + (1-beta)·Y - s·gamma·dir = W' whenever V = Y = W,
    and Y' = alpha·V' + (1-alpha)·W' = W'), i.e. the Nesterov coupling is
    exactly inert and the method IS plain SAP. The headline experiment is
    run as configured regardless — the point is scale, not acceleration.
    """
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import SAPAccelConfig, SAPConfig

    n, d, k = 10_000_000, 50, 10
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32) / d**0.5
    y = jax.random.normal(kb, (n, k), dtype=jnp.float32)
    reg = 1e-2
    blk_sz = n // 100
    K = RBFLinOp(
        X, X, KernelConfig(lengthscale=1.0), compute_dtype="bf16x3"
    )
    sys_ = LinSys(
        K, y, reg=float(reg), A_row_oracle=K.row_oracle,
        A_blk_oracle=K.blk_oracle,
    )
    cfg = SAPConfig(
        max_iters=max_iters, rtol=1e-6, blk_sz=blk_sz,
        precond_config=NystromConfig(rank=100, rho=float(reg)),
        accel=True,
        accel_config=SAPAccelConfig(mu=float(reg), nu=100.0),
        power_iters=10,
    )
    t0 = time.perf_counter()
    W, log = sys_.solve(
        cfg, jnp.zeros((n, k), dtype=jnp.float32), callback_freq=5, key=key,
        metrics="sampled",
    )
    _sync(W)
    wall = time.perf_counter() - t0
    its = sorted(i for i in log.keys() if isinstance(i, int))
    rels = [
        float(jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"]))
        for i in its
    ]
    it = its[-1]
    chunk_walls = [log[i]["iter_time"] for i in its[1:]]
    med_chunk = sorted(chunk_walls)[len(chunk_walls) // 2] if chunk_walls else 0
    _result(
        "askotch_krr_10m_reference_scale", wall,
        {
            "n": n, "d": d, "k": k,
            "iters": it,
            "rel_res_sampled": rels[-1],
            "rel_trajectory_every_25": {
                i: round(r, 6) for i, r in zip(its, rels) if i % 25 == 0
            },
            "iters_per_s_overall": round(it / wall, 3),
            "s_per_iter_steady": round(med_chunk / 5.0, 2),
            "reference_hardware": "3x CUDA GPUs "
            "(experiments/distributed_krr_linsys_askotch_solve_test.py)",
            "this_hardware": "1x TPU v5e chip",
        },
    )


def config8_accelerated_sap_certified():
    """Accelerated SAP reaching a CERTIFIED target (VERDICT r3 item 4).

    The reference's own headline hyperparameters make the acceleration
    recurrence inert (mu·nu = 1, see SAPAccelConfig); no capture anywhere
    had shown ASkotch's acceleration both (a) measurably beating plain
    SAP and (b) ending at a certified residual. This config does both on
    an n=100k RBF KRR with moderate conditioning:

    1. a 50-iteration PLAIN pilot measures the per-iteration contraction
       of the preconditioned sampled operator — the spectral quantity
       the accelerated recurrence's mu wants (``sap_accel_from_pilot``);
    2. plain vs accelerated trajectories at equal iteration count;
    3. the accelerated solution is refined (1 round, accel device,
       residual-update mode) and the final answer CERTIFIED by the
       host-side streamed full f64 residual — independent numpy code.
    """
    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import SAPConfig, sap_accel_from_pilot

    n, d = 100_000, 10
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    y = jax.random.normal(kb, (n,), dtype=jnp.float32)
    reg = 1e-5 * n
    ls = float(d) ** 0.5
    blk = n // 8
    K = RBFLinOp(X, X, KernelConfig(lengthscale=ls), compute_dtype="bf16x3")
    base = dict(
        rtol=1e-7, blk_sz=blk,
        precond_config=NystromConfig(rank=256, rho=float(reg)),
        power_iters=10,
    )

    def run(cfg, refine=False):
        sys_ = LinSys(
            K, y, reg=float(reg),
            A_row_oracle=K.row_oracle, A_blk_oracle=K.blk_oracle,
        )
        kwargs = {}
        if refine:
            # "evaluate", 2 rounds — NOT "update": this problem's small
            # reg (1e-5·n vs the north star's 1e-4·n) makes the
            # correction δ ~100× larger relative to the residual, and the
            # update term's f32 kernel-value error (1e-7 × the RBF row
            # sums ~n·e⁻¹ × |δ|) lands at ~6e-6‖b‖ — measured: the
            # update-mode capture claimed 1.12e-6 while the host read
            # 7.0e-6 true. Exactly the documented update-mode caveat;
            # with the symmetric value64 engine a full re-evaluation at
            # n=1e5 is ~5 s, so "evaluate" costs almost nothing here.
            # Two rounds because the SAP correction solve stalls at
            # ~5e-3 of its RHS per round (300 block-coordinate iters).
            kwargs = dict(
                f64_refine_rounds=2, f64_refine_device="accel",
            )
        t0 = time.perf_counter()
        W, log = sys_.solve(
            cfg, jnp.zeros((n, 1), jnp.float32), callback_freq=25,
            key=jax.random.PRNGKey(7), metrics="true", **kwargs,
        )
        wall = time.perf_counter() - t0
        its = sorted(i for i in log if isinstance(i, int))
        traj = {
            i: float(
                jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"])
            )
            for i in its
        }
        return W, log, traj, wall

    t_all = time.perf_counter()
    pilot_iters, run_iters = 50, 300
    _, _, ptraj, pilot_wall = run(
        SAPConfig(max_iters=pilot_iters, accel=False, **base)
    )
    acc = sap_accel_from_pilot(ptraj[pilot_iters], pilot_iters, n, blk)
    _, _, plain_traj, plain_wall = run(
        SAPConfig(max_iters=run_iters, accel=False, **base)
    )
    W, log, accel_traj, accel_wall = run(
        SAPConfig(max_iters=run_iters, accel=True, accel_config=acc, **base),
        refine=True,
    )
    wall = time.perf_counter() - t_all
    # independent certification: streamed full f64 residual, numpy only
    r = _f64_residual(X, y, W, float(reg), ls)
    import numpy as np

    rel_true = float(
        np.linalg.norm(r) / np.linalg.norm(np.asarray(y, np.float64))
    )
    _result(
        "accelerated_sap_certified_100k", wall,
        {
            "pilot": {"iters": pilot_iters, "rel_res": ptraj[pilot_iters],
                      "wall_s": round(pilot_wall, 1)},
            "accel_params": {"mu": acc.mu, "nu": acc.nu},
            "plain_rel_res_trajectory": {
                i: round(v, 8) for i, v in plain_traj.items() if i % 50 == 0
            },
            "accel_rel_res_trajectory": {
                i: round(v, 8) for i, v in accel_traj.items() if i % 50 == 0
            },
            "accel_vs_plain_at_equal_iters": round(
                plain_traj[run_iters] / accel_traj[run_iters], 2
            ),
            "plain_wall_s": round(plain_wall, 1),
            "accel_wall_s_incl_refine": round(accel_wall, 1),
            "refine_claimed": [
                float(max(h)) for h in log["f64_refine"]["rel_res_f64"]
            ],
            "rel_res_true_f64_host": rel_true,
            "certified_1e-6": bool(rel_true <= 1e-6),
        },
    )


def _value64_residual_sampled(X, Y_rhs, W, reg, ls, s=2048, seed=11):
    """f64-GRADE sampled relative residual at scales where even one full
    residual sweep is infeasible (n=10M: 1e14 kernel values).

    s uniformly sampled rows of ``B − (K + reg·I) W``, with the kernel
    rows evaluated through the certified value64 engine
    (``kernel_matmat_value64``, ~3e-9-accurate values) and everything
    else in host f64 — an unbiased estimate of the true residual norm
    (E[(n/s)·Σ‖r_i‖²] = ‖R‖²) at ~(2s)^-1/2 relative standard error.
    Independent of the solver's own metrics path.
    """
    import numpy as np

    from rlaopt_tpu.ops.kernel_value64 import kernel_matmat_value64

    n = X.shape[0]
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(n, size=min(s, n), replace=False))
    s = idx.size
    Xr = np.asarray(X[jnp.asarray(idx)])
    hi, lo = kernel_matmat_value64(
        Xr, X, np.asarray(W, np.float32), ls, kind="rbf"
    )
    KW = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    W64 = np.asarray(W, np.float64)
    B64 = np.asarray(Y_rhs, np.float64)
    if B64.ndim == 1:
        B64 = B64[:, None]
    if W64.ndim == 1:
        W64 = W64[:, None]
        KW = KW.reshape(s, -1)
    r = B64[idx] - (KW + float(reg) * W64[idx])
    est = np.linalg.norm(r) * (n / s) ** 0.5
    return float(est / np.linalg.norm(B64)), float((2.0 * s) ** -0.5)


def config9_askotch_10m_converging(max_iters=150):
    """The n=10M reference-headline scale ACTUALLY CONVERGING (round 5).

    Config 7 reproduces the reference experiment parameter-for-parameter
    — including its inert acceleration (mu·nu = 1) and hyperparameters
    under which the residual barely moves in 300 iterations. This config
    runs the SAME problem (150 iterations — wall-bounded; the reference
    runs 300) with the toolkit's pilot-derived acceleration
    (``sap_accel_from_pilot``, certified at n=1e5 in round 4) and
    certifies the trajectory with the independent f64-grade sampled
    value64 estimator (:func:`_value64_residual_sampled`): the capture
    shows true measured contraction at n=10M on one chip, turning
    "the pipeline fits" (config 7) into "it solves" (VERDICT r4 item 3).
    Anchor: experiments/distributed_krr_linsys_askotch_solve_test.py:15-55.
    """
    import numpy as np

    from rlaopt_tpu.kernels import KernelConfig, RBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import SAPConfig, sap_accel_from_pilot

    n, d, k = 10_000_000, 50, 10
    key = jax.random.PRNGKey(0)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (n, d), dtype=jnp.float32) / d**0.5
    y = jax.random.normal(kb, (n, k), dtype=jnp.float32)
    # Measured this round: at the reference's reg=1e-2 (ABSOLUTE — i.e.
    # reg/n = 1e-9) a 30-iteration plain pilot shows ZERO contraction
    # (sampled rel-res 1.0012 ± 1%): that spectrum is out of reach of
    # ANY (mu, nu) in 300 block-coordinate iterations (consistent with
    # benchmarks/askotch_control.py's ~5e5-iteration estimate at config
    # 4's scale). Config 7 keeps the reference numbers verbatim; THIS
    # config's point is the n=10M problem actually solving, so it uses a
    # statistically sane KRR regularization reg = 1e-5*n (the pilot
    # decides mu either way and the capture records it).
    reg = 1e-5 * n
    ls = 1.0
    blk_sz = n // 100
    K = RBFLinOp(X, X, KernelConfig(lengthscale=ls), compute_dtype="bf16x3")
    sys_ = LinSys(
        K, y, reg=float(reg), A_row_oracle=K.row_oracle,
        A_blk_oracle=K.blk_oracle,
    )
    base = dict(
        rtol=1e-6, blk_sz=blk_sz,
        precond_config=NystromConfig(rank=100, rho=float(reg)),
        power_iters=10,
    )
    t_all = time.perf_counter()

    # Pilot: plain SAP measures the per-iteration contraction of the
    # preconditioned sampled operator — the mu the recurrence wants.
    pilot_iters = 60
    t0 = time.perf_counter()
    W_p, plog = sys_.solve(
        SAPConfig(max_iters=pilot_iters, accel=False, **base),
        jnp.zeros((n, k), jnp.float32), callback_freq=5,
        key=jax.random.PRNGKey(7), metrics="sampled",
    )
    pilot_wall = time.perf_counter() - t0
    pits = sorted(i for i in plog if isinstance(i, int))
    pilot_rel = float(
        jnp.max(plog[pits[-1]]["metrics"]["internal_metrics"]["rel_res"])
    )
    print(
        f"[c9] pilot done: rel={pilot_rel:.4g} wall={pilot_wall:.0f}s",
        file=sys.stderr, flush=True,
    )
    try:
        acc = sap_accel_from_pilot(pilot_rel, pilot_iters, n, blk_sz)
        acc_source = "sap_accel_from_pilot"
    except ValueError:
        # pilot shows no measurable contraction: run with the maximal
        # live mu (mu*nu = 0.9) and record the pilot finding honestly
        from rlaopt_tpu.solvers import SAPAccelConfig

        acc = SAPAccelConfig(mu=0.9 * blk_sz / n, nu=n / blk_sz)
        acc_source = "pilot_no_contraction_fallback_max_live_mu"
    del W_p

    # Main run: accelerated, reference iteration count, W snapshots
    # captured at the logging boundaries for post-hoc f64-grade
    # certification (a value64-sampled residual per snapshot).
    snaps = {}
    snap_every = 50
    t0 = time.perf_counter()
    # the callback fires at iteration 0 first, then every callback_freq=5
    counter = {"i": -5}

    def cb(w, model):
        counter["i"] += 5
        if counter["i"] > 0 and counter["i"] % 25 == 0:
            print(f"[c9] iter ~{counter['i']}", file=sys.stderr, flush=True)
        if counter["i"] > 0 and counter["i"] % snap_every == 0:
            snaps[counter["i"]] = np.asarray(w, np.float32)
        return {}

    W, log = sys_.solve(
        SAPConfig(max_iters=max_iters, accel=True, accel_config=acc, **base),
        jnp.zeros((n, k), jnp.float32), callback_freq=5,
        callback_fn=cb,
        key=jax.random.PRNGKey(7), metrics="sampled",
    )
    _sync(W)
    accel_wall = time.perf_counter() - t0
    its = sorted(i for i in log if isinstance(i, int))
    sampled_traj = {
        i: float(jnp.max(log[i]["metrics"]["internal_metrics"]["rel_res"]))
        for i in its
    }
    print(
        "[c9] sampled traj:",
        {i: round(r, 5) for i, r in sampled_traj.items() if i % 25 == 0},
        f"accel_wall={accel_wall:.0f}s",
        file=sys.stderr, flush=True,
    )

    # f64-grade certification of the trajectory: value64-sampled residual
    # at the snapshots plus the final iterate (each ~2e10 certified kernel
    # values; independent of the solver's own metrics).
    t0 = time.perf_counter()
    cert = {}
    for i in sorted(snaps):
        rel, stderr = _value64_residual_sampled(
            X, y, snaps[i], reg, ls
        )
        cert[i] = rel
        print(f"[c9] cert iter {i}: rel={rel:.4g}", file=sys.stderr,
              flush=True)
    rel_final, stderr = _value64_residual_sampled(X, y, W, reg, ls)
    print(f"[c9] cert final: rel={rel_final:.4g}", file=sys.stderr,
          flush=True)
    cert[its[-1]] = rel_final
    cert_wall = time.perf_counter() - t0

    wall = time.perf_counter() - t_all
    chunk_walls = [log[i]["iter_time"] for i in its[1:]]
    med_chunk = sorted(chunk_walls)[len(chunk_walls) // 2] if chunk_walls else 0
    _result(
        "askotch_krr_10m_converging", wall,
        {
            "n": n, "d": d, "k": k, "blk_sz": blk_sz, "reg": reg,
            "pilot": {"iters": pilot_iters, "rel_res_sampled": pilot_rel,
                      "wall_s": round(pilot_wall, 1)},
            "accel_params": {"mu": acc.mu, "nu": acc.nu,
                             "source": acc_source},
            "iters": its[-1],
            "accel_wall_s": round(accel_wall, 1),
            "s_per_iter_steady": round(med_chunk / 5.0, 2),
            "rel_res_sampled_trajectory_every_25": {
                i: round(r, 6) for i, r in sampled_traj.items() if i % 25 == 0
            },
            "rel_res_value64_certified": {
                i: round(r, 8) for i, r in cert.items()
            },
            "value64_cert_stderr": stderr,
            "value64_cert_wall_s": round(cert_wall, 1),
            "contraction_from_init_certified": round(
                1.0 / max(rel_final, 1e-300), 1
            ),
            "reference_hyperparams_inert": "config 7 runs mu*nu=1 "
            "(the reference's own values) — the recurrence is exactly "
            "inert and the residual stays ~1.0 at 300 iters",
            "this_hardware": "1x TPU v5e chip",
        },
    )


CONFIGS = {
    1: config1_nystrom_pcg_cpu,
    2: config2_srht_lsqr,
    3: config3_krr_pcg,
    4: config4_askotch_1m,
    5: config5_sharded_krr,
    6: config6_northstar_1m_pcg,
    7: config7_askotch_10m_reference_scale,
    8: config8_accelerated_sap_certified,
    9: config9_askotch_10m_converging,
}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument(
        "--config", type=int, default=None, help="1..7; default 1..6"
    )
    args = p.parse_args()
    todo = [args.config] if args.config else [c for c in sorted(CONFIGS) if c != 7]
    for c in todo:
        CONFIGS[c]()
