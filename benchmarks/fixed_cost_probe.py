"""Microbenchmark: isolate the fixed per-sweep K-materialization cost.

Round-2 claim (RESULTS_r2.md): any fused Gram-matvec kernel pays a fixed
~2.6 ms per 16384x16384 sweep — the cost of materializing the K tile in
VMEM and consuming it with the contraction — invariant to d, tile shape,
and pass structure. That cost is what caps the d=256 exact tier near ~0.69
of the pass-count roofline. This probe measures it directly and writes the
artifact (benchmarks/FIXED_COST_r3.json) the claim can be audited against.

Method
------
Per-sweep wall time of ``kernel_matmat_pallas`` at n=m=16384, k=8 as a
function of d in {128, 256, 384, 512}:

    t(d) = a + b*d

is fit by least squares separately for the exact (6-pass) and bf16x3
(3-pass) tiers. The slope b is the per-pass MXU cross-term cost; the
intercept a is the d-independent fixed cost (K materialize + epilogue +
contraction + grid overhead). If the claim holds, (i) the two intercepts
agree within noise even though the pass structures differ 2x, and (ii)
tile-shape variants at d=256 move per-sweep time by far less than the
intercept.

Timing uses the chained-jit protocol from bench.py (the tunnel's ~20-40 ms
dispatch latency would otherwise dominate): each timed call chains enough
sweeps for >=0.35 s of device time.

Run:  python benchmarks/fixed_cost_probe.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_benchcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = M = 16384
K = 8
DS = (128, 256, 384, 512)
TILE_VARIANTS = ((None, None), (256, 512), (512, 512), (256, 1024))
TARGET_CALL_S = 0.35


def _chain_fn(tier, d, tile_m, tile_n, chain, pipeline):
    from rlaopt_tpu.ops.kernel_pallas import kernel_matmat_pallas

    key = jax.random.PRNGKey(0)
    X1 = jax.random.normal(key, (N, d), jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (M, d), jnp.float32)
    V0 = jax.random.normal(jax.random.fold_in(key, 2), (M, K), jnp.float32)

    @jax.jit
    def f():
        def body(_, v):
            out = kernel_matmat_pallas(
                "rbf", X1, X2, v, float(d) ** 0.5, 1.0,
                tile_m=tile_m, tile_n=tile_n, compute_dtype=tier,
                pipeline=pipeline,
            )
            return out / jnp.linalg.norm(out)

        v = jax.lax.fori_loop(0, chain, body, V0)
        return jnp.sum(v)

    return f


def _per_sweep_ms(tier, d, tile_m=None, tile_n=None, trials=3, pipeline=False):
    f = _chain_fn(tier, d, tile_m, tile_n, 4, pipeline)
    float(f())
    t0 = time.perf_counter()
    float(f())
    pilot = (time.perf_counter() - t0) / 4
    chain = max(4, int(math.ceil(TARGET_CALL_S / pilot)))
    f = _chain_fn(tier, d, tile_m, tile_n, chain, pipeline)
    float(f())
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(f())
        times.append((time.perf_counter() - t0) / chain)
    return min(times) * 1e3


def main():
    out = {"n": N, "m": M, "k": K}

    for tier_name, tier in (("exact", None), ("bf16x3", "bf16x3")):
        for pipe in (False, True):
            label = tier_name + ("_pipelined" if pipe else "")
            sweep = {d: _per_sweep_ms(tier, d, pipeline=pipe) for d in DS}
            A = np.stack([np.ones(len(DS)), np.asarray(DS, float)], axis=1)
            coef, *_ = np.linalg.lstsq(
                A, np.array([sweep[d] for d in DS]), rcond=None
            )
            a_ms, b_ms_per_d = float(coef[0]), float(coef[1])
            out[label] = {
                "per_sweep_ms": {str(d): round(v, 3) for d, v in sweep.items()},
                "intercept_fixed_cost_ms": round(a_ms, 3),
                "slope_ms_per_d": round(b_ms_per_d, 5),
            }

    tiles = {}
    for tm, tn in TILE_VARIANTS:
        name = "auto" if tm is None else f"{tm}x{tn}"
        try:
            tiles[name] = round(_per_sweep_ms(None, 256, tm, tn), 3)
        except Exception as e:
            tiles[name] = f"failed: {type(e).__name__}"
    out["tile_variants_d256_exact_ms"] = tiles

    ex, b3 = out["exact"], out["bf16x3"]
    out["summary"] = {
        "fixed_cost_ms_exact": ex["intercept_fixed_cost_ms"],
        "fixed_cost_ms_bf16x3": b3["intercept_fixed_cost_ms"],
        "intercepts_agree_across_2x_pass_structures": bool(
            abs(ex["intercept_fixed_cost_ms"] - b3["intercept_fixed_cost_ms"])
            < 0.5 * max(ex["intercept_fixed_cost_ms"], 1e-9)
        ),
        "claimed_ms_r2": 2.6,
    }

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "FIXED_COST_r3.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
