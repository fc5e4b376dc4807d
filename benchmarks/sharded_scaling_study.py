"""P-scaling study of the sharded kernel operator on a virtual CPU mesh.

VERDICT r3 item 5: capture the sharded path at P > 1. The build host has
ONE core, so virtual-device wall-clock SPEEDUP is not measurable — the
8 XLA:CPU devices time-share the core and wall tracks the TOTAL work
across devices. That makes three things measurable and worth recording:

1. **Collective schedule** (from compiled HLO): per full matvec,
   replicated mode is collective-free forward (output stays row-sharded)
   and the symmetric ring pays ~⌈P/2⌉ ``collective-permute`` hops plus
   the one permute that delivers the mirror accumulators home.
2. **Work accounting**: on a time-shared core wall tracks total work.
   CAVEAT (measured): on CPU ``kernel_pair`` falls back to TWO
   streaming XLA calls (the fused two-output pair kernel is
   Pallas/TPU-only), so the CPU ring pays ~2x the pair-block work the
   TPU path does — ring wall here reads HIGHER than replicated, which
   is the fallback's cost, not the schedule's. The TPU-side halving
   evidence is benchmarks/SYM_BANDED_r3.json (pair kernel 1.50-1.76x
   over general) and SYM_K10_r4.json; what THIS study adds at P > 1 is
   the schedule, parity, and cross-P solver agreement.
3. **Parity**: every (P, mode) matvec agrees with a sampled dense f64
   Gram row set; a 10-iteration Nystrom-PCG reaches the same residual
   at every P and mode (solver trajectory is P-invariant).

Ring meshes must own ALL devices of the platform (XLA:CPU ppermute over
a device subset corrupts the heap — see parallel/mesh.py), so each P
runs in its own subprocess with --xla_force_host_platform_device_count.

Usage: python benchmarks/sharded_scaling_study.py            # parent
       python benchmarks/sharded_scaling_study.py child P MODE
Writes benchmarks/SHARDED_SCALING_r4.json.
"""

import json
import os
import subprocess
import sys
import time

N, D, K_RHS = 12800, 28, 1
SEED = 0


def child(p: int, mode: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from rlaopt_tpu.kernels import KernelConfig, ShardedRBFLinOp
    from rlaopt_tpu.models import LinSys
    from rlaopt_tpu.parallel import make_mesh
    from rlaopt_tpu.preconditioners import NystromConfig
    from rlaopt_tpu.solvers import PCGConfig

    assert len(jax.devices()) == p, (len(jax.devices()), p)
    key = jax.random.PRNGKey(SEED)
    kx, kb = jax.random.split(key)
    X = jax.random.normal(kx, (N, D), jnp.float32)
    y = jax.random.normal(kb, (N, K_RHS), jnp.float32)
    ls = float(D) ** 0.5
    mesh = make_mesh()
    A = ShardedRBFLinOp(
        X, X, KernelConfig(lengthscale=ls), mesh=mesh, memory_mode=mode
    )
    v = jax.random.normal(jax.random.fold_in(key, 3), (N,), jnp.float32)

    # 1. collective schedule of one full matvec, from compiled HLO.
    # Static sites only — a permute inside a lax.scan body appears once in
    # the text but executes once per scan step, so the DYNAMIC hop count
    # for the symmetric ring is computed from its schedule alongside:
    # (ceil(P/2) - 1) rotation steps x 3 rotating buffers (X shard,
    # V shard, mirror accumulator) + 1 final mirror-delivery permute.
    txt = jax.jit(lambda u: A @ u).lower(v).compile().as_text()
    colls = {
        name: txt.count(f"{name}(") + txt.count(f"{name}-start(")
        for name in ("all-reduce", "all-gather", "collective-permute",
                     "all-to-all", "reduce-scatter")
    }
    if mode == "ring" and p > 1:
        ns = p // 2 + 1 if p % 2 == 0 else (p + 1) // 2
        colls["dynamic_permute_hops"] = (ns - 1) * 3 + 1
    else:
        colls["dynamic_permute_hops"] = 0

    # 2. total-work proxy: median wall of a full matvec (time-shared core)
    out = (A @ v).block_until_ready()
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        (A @ v).block_until_ready()
        walls.append(time.perf_counter() - t0)
    mv_wall = sorted(walls)[len(walls) // 2]

    # 3. parity vs the dense Gram + a short Nystrom-PCG train
    idx = np.arange(0, N, N // 640)  # sampled rows: dense check is O(s*N)
    X64 = np.asarray(X, np.float64) / ls
    d2 = (
        (X64[idx] ** 2).sum(1)[:, None]
        + (X64**2).sum(1)[None, :]
        - 2.0 * X64[idx] @ X64.T
    )
    ref = np.exp(-0.5 * np.maximum(d2, 0.0)) @ np.asarray(v, np.float64)
    got = np.asarray(out, np.float64)[idx]
    parity = float(
        np.linalg.norm(got - ref) / np.linalg.norm(ref)
    )

    reg = 1e-4 * N
    sys_ = LinSys(A, y, reg=float(reg))
    t0 = time.perf_counter()
    W, log = sys_.solve(
        PCGConfig(
            max_iters=10, rtol=1e-12,
            precond_config=NystromConfig(rank=100, rho=float(reg)),
        ),
        jnp.zeros_like(y),
        callback_freq=10,
        key=key,
    )
    W.block_until_ready()
    solve_wall = time.perf_counter() - t0
    it = max(i for i in log.keys() if isinstance(i, int))
    rel = float(jnp.max(log[it]["metrics"]["internal_metrics"]["rel_res"]))

    print(json.dumps({
        "P": p, "mode": mode, "collectives_per_matvec": colls,
        "matvec_wall_s": round(mv_wall, 3),
        "parity_vs_dense_f64": parity,
        "pcg10_wall_s": round(solve_wall, 2),
        "pcg10_rel_res": rel,
    }))


def parent():
    results = []
    for p in (1, 2, 4, 5, 8):
        modes = ["replicated"] if p == 1 else ["replicated", "ring"]
        for mode in modes:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={p}"
            ).strip()
            t0 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, __file__, "child", str(p), mode],
                capture_output=True, text=True, env=env, timeout=2400,
            )
            if proc.returncode != 0:
                print(f"P={p} {mode} FAILED:\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                results.append({"P": p, "mode": mode, "error": "rc!=0"})
                continue
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            row["subprocess_wall_s"] = round(time.perf_counter() - t0, 1)
            results.append(row)
            print(row, file=sys.stderr)
    out = {
        "benchmark": "sharded_scaling_cpu_mesh",
        "n": N, "d": D, "note": (
            "single-core host: wall measures TOTAL work across virtual "
            "devices, not speedup; see module docstring"
        ),
        "results": results,
    }
    path = os.path.join(os.path.dirname(__file__),
                        "SHARDED_SCALING_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        parent()
