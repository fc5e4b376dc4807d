"""Benchmark: fused RBF Gram matvec throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "TFLOP/s", "vs_baseline": N}

Tracked metric (BASELINE.json): kernel matvec TFLOP/s per chip, north star
>= 70% of roofline. ``vs_baseline`` is the achieved fraction of that target
measured against the chip's *observed* matmul peak (a chained bf16 4096^3
matmul timed in the same run): 1.0 means the fused kernel runs at 70% of
what the MXU actually delivers on this chip.

Timing protocol: on the tunneled TPU runtime ``block_until_ready`` does not
synchronize reliably, so each measurement chains dependent applications
inside one jit and fetches a scalar, which forces execution.

Note: the tunnel chip is time-shared; absolute throughput (both the peak and
the kernel) varies up to ~2x between sessions, and the ratio ±20% (observed
0.8-1.07 across round-1 runs). Peak and kernel are measured back-to-back in
the same process to keep the ratio as fair as the environment allows.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_benchcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _bench_scalar(f, chain, trials=6):
    """f: jitted nullary returning a scalar after `chain` applications."""
    float(f())  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(f())
        times.append(time.perf_counter() - t0)
    return min(times) / chain


def measured_matmul_peak_tflops(chain=20) -> float:
    n = 4096
    A = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    @jax.jit
    def f():
        x = A
        for _ in range(chain):
            x = jnp.matmul(x, A, preferred_element_type=jnp.bfloat16)
            x = (x / jnp.max(jnp.abs(x))).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    dt = _bench_scalar(f, chain)
    return 2.0 * n**3 / dt / 1e12


def fused_kernel_tflops(chain=20) -> float:
    from rlaopt_tpu.ops.kernel_pallas import kernel_matmat_pallas

    n = m = 16384
    d, k = 256, 8
    key = jax.random.PRNGKey(0)
    X1 = jax.random.normal(key, (n, d), jnp.float32)
    X2 = jax.random.normal(jax.random.fold_in(key, 1), (m, d), jnp.float32)
    V0 = jax.random.normal(jax.random.fold_in(key, 2), (m, k), jnp.float32)

    @jax.jit
    def f():
        v = V0
        for _ in range(chain):
            out = kernel_matmat_pallas(
                "rbf", X1, X2, v, float(d) ** 0.5, 1.0,
                tile_m=512, tile_n=1024, compute_dtype="bfloat16",
            )
            v = out / jnp.linalg.norm(out)
        return jnp.sum(v)

    dt = _bench_scalar(f, chain)
    return 2.0 * n * m * (d + k) / dt / 1e12


def main():
    peak = measured_matmul_peak_tflops()
    tflops = fused_kernel_tflops()
    target = 0.7 * peak
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
