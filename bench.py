"""Benchmark: fused RBF Gram matvec throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "TFLOP/s", "vs_baseline": N}

The tracked metric (BASELINE.json) is kernel/sketch matvec TFLOP/s per chip
with a ≥70%-of-roofline north star. ``vs_baseline`` is the achieved fraction
of that 70% target for the chip's bf16 matmul peak (v5e ≈ 197 TFLOP/s, v5p ≈
459): 1.0 means the target is met.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_benchcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _chip_bf16_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197.0
    if "v5p" in kind or "v5" in kind:
        return 459.0
    if "v4" in kind:
        return 275.0
    if "v6" in kind:
        return 918.0
    return 197.0


def main():
    from rlaopt_tpu.ops.kernel_pallas import kernel_matmat_pallas

    n = m = 32768
    d, k = 256, 8
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    kx, ky, kv = jax.random.split(key, 3)
    X1 = jax.random.normal(kx, (n, d), dtype=dtype)
    X2 = jax.random.normal(ky, (m, d), dtype=dtype)
    V = jax.random.normal(kv, (m, k), dtype=dtype)

    def run():
        return kernel_matmat_pallas(
            "rbf", X1, X2, V, float(d) ** 0.5, 1.0,
            tile_m=512, tile_n=1024, compute_dtype="bfloat16",
        )

    run().block_until_ready()  # compile
    iters = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    flops = 2.0 * n * m * (d + k)
    tflops = flops / dt / 1e12
    target = 0.7 * _chip_bf16_peak_tflops()
    print(
        json.dumps(
            {
                "metric": "rbf_gram_matvec_tflops_per_chip",
                "value": round(tflops, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
