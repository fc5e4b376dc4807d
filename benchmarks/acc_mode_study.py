"""On-chip study: where should the RHS contraction run — VPU or MXU?

The Gram-matvec kernel contracts each (TM, TN) kernel tile with the RHS
block V (k columns). Two engines can do it:

* ``("vpu", k)`` — per-column broadcast-multiply + lane reduce, ~2k VPU
  ops per kernel value, overlapped with the next tile's MXU cross passes
  by the software pipeline;
* MXU ``"split"``/``"highest"`` — 3/6 bf16 passes with the k dimension
  padded to the 128-wide output lanes (cost independent of k ≤ 128).

Round 2 chose the VPU whenever k ≤ 16, reasoning from the d=256 exact
tier where the MXU cross term (6·256 depth) dwarfs a padded contraction
pass. That reasoning inverts at SMALL d: with the concat fold the d=28
bf16x3 cross term is ONE 128-deep pass, while a k=10 VPU contraction is
~20 VPU ops per value — several times the cross time. This script
measures the general kernel's throughput across (tier, d, k, acc_mode)
on the real chip so the dispatch rule is a measurement, not a guess.

Accuracy gates (why not MXU for everything): the exact tier requires a
near-f32 contraction — ``highest`` (6 passes) is tier-matched, ``split``
(~2⁻¹⁸ per product) is not; bf16x3 (~2⁻¹⁸ cross) accepts ``split``.

Writes benchmarks/ACC_MODE_r3.json. Run on the accelerator:
    python benchmarks/acc_mode_study.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpucache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

N = M = 16384
TIER_ARG = {"exact": None, "bf16x3": "bf16x3"}
TARGET_CALL_S = 0.35


def bench_scalar(f, chain, trials=3):
    float(f())
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    return min(ts) / chain


def make_kernel(tier, d, k, acc_mode):
    from rlaopt_tpu.ops.kernel_pallas import kernel_matmat_pallas

    key = jax.random.PRNGKey(0)
    X1 = jax.random.normal(key, (N, d), jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (M, d), jnp.float32)
    V0 = jax.random.normal(jax.random.fold_in(key, 2), (M, k), jnp.float32)

    def make(chain):
        @jax.jit
        def f():
            def body(_, v):
                out = kernel_matmat_pallas(
                    "rbf", X1, X2, v, float(d) ** 0.5, 1.0,
                    compute_dtype=TIER_ARG[tier], acc_mode=acc_mode,
                )
                return out / jnp.linalg.norm(out)

            v = jax.lax.fori_loop(0, chain, body, V0)
            return jnp.sum(v)

        return f, chain

    return make


def measure(tier, d, k, acc_mode):
    make = make_kernel(tier, d, k, acc_mode)
    f, chain = make(8)
    per = bench_scalar(f, chain, trials=2)
    need = max(8, int(math.ceil(TARGET_CALL_S / per)))
    if need > chain:
        f, chain = make(need)
    per = bench_scalar(f, chain)
    return per


def main():
    out = {}
    grid = []
    for tier in ("exact", "bf16x3"):
        for d in (28, 256):
            for k in (1, 8, 16):
                accs = ["vpu", "split"]
                if tier == "exact":
                    accs = ["vpu", "highest", "split"]
                for acc in accs:
                    grid.append((tier, d, k, acc))
    for tier, d, k, acc in grid:
        name = f"{tier}_d{d}_k{k}_{acc}"
        try:
            per = measure(tier, d, k, acc)
        except Exception as e:  # noqa: BLE001 — record and continue
            out[name] = {"error": str(e)[:200]}
            print(name, "ERROR", str(e)[:120], flush=True)
            continue
        sweeps_per_s = 1.0 / per
        out[name] = {
            "ms_per_sweep": round(per * 1e3, 4),
            "sweeps_per_s": round(sweeps_per_s, 2),
        }
        print(name, f"{per * 1e3:.3f} ms/sweep", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ACC_MODE_r3.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
