"""On-chip study: what is the real VPU speed-of-light for the Laplace op mix?

Round-3's BENCH capture reported the Laplace family kernel at 11.8x its own
"VPU bound" — impossible, so the bound probe was wrong. The old probe
(`jnp.abs(u - acc) + v` over an HBM-resident (4096,512) array in a fused
XLA fori_loop) is bandwidth-bound: XLA re-reads the operands from HBM every
iteration, so it measures ~0.14 Tpairs/s while the Pallas Laplace kernel —
whose tiles are VMEM-resident — streams ~1.7 Tpairs/s of genuine
sub+abs+add work.

This script measures three candidates on the real chip:
  A. the old XLA fused-loop probe (for the record);
  B. a VMEM-resident Pallas probe mirroring the Laplace body's exact
     broadcast pattern (column-of-X minus row-of-Y, abs, accumulate);
  C. a VMEM-resident Pallas probe without broadcasts (pure elementwise
     sub+abs+add on equal-shaped tiles) — an upper bound if broadcasts
     cost extra.

The max of B/C is the defensible hardware bound for the Laplace roofline.
Run: python benchmarks/vpu_probe_study.py   (needs the accelerator)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_scalar(f, trials=3):
    f().block_until_ready()
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        f().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---------------------------------------------------------------- A: old XLA
def probe_xla(chain=2000):
    n_r, n_c = 4096, 512
    u = jax.random.normal(jax.random.PRNGKey(7), (n_r, n_c), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(8), (n_r, n_c), jnp.float32)

    @jax.jit
    def f():
        def body(_, acc):
            return jnp.abs(u - acc) + v

        z = lax.fori_loop(0, chain, body, v, unroll=8)
        return jnp.sum(z)

    pairs = float(n_r * n_c) * chain
    return f, pairs


# ------------------------------------------------- B: Pallas, laplace layout
def _body_bcast(x_ref, y_ref, o_ref, l1_ref, *, nb, fb):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        l1_ref[:] = jnp.zeros_like(l1_ref)

    xt = x_ref[0]
    yt = y_ref[0]
    l1 = l1_ref[:]
    for f in range(fb):
        l1 = l1 + jnp.abs(xt[:, f : f + 1] - yt[f : f + 1, :])
    l1_ref[:] = l1

    @pl.when(b == nb - 1)
    def _():
        o_ref[:] = l1_ref[:]


def probe_pallas_bcast(tile_m=256, tile_n=256, fb=64, nb=64, chain=1500):
    kx = jax.random.PRNGKey(0)
    X = jax.random.normal(kx, (nb, tile_m, fb), jnp.float32)
    Y = jax.random.normal(jax.random.fold_in(kx, 1), (nb, fb, tile_n), jnp.float32)

    call = pl.pallas_call(
        functools.partial(_body_bcast, nb=nb, fb=fb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, tile_m, fb), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, fb, tile_n), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((tile_m, tile_n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
    )

    @jax.jit
    def f():
        def body(_, carry):
            out = call(X * (1.0 + 0.0 * carry), Y)
            return jnp.sum(out)

        return lax.fori_loop(0, chain, body, 0.0)

    pairs = float(tile_m * tile_n * fb * nb) * chain
    return f, pairs


# -------------------------------------------- C: Pallas, pure elementwise
def _body_elem(x_ref, y_ref, o_ref, *, reps):
    x = x_ref[:]
    y = y_ref[:]
    acc = y
    for _ in range(reps):
        acc = jnp.abs(acc - x) + y
    o_ref[:] = acc


def probe_pallas_elem(tile_m=256, tile_n=256, reps=64, grid=64, chain=1500):
    kx = jax.random.PRNGKey(0)
    X = jax.random.normal(kx, (grid * tile_m, tile_n), jnp.float32)
    Y = jax.random.normal(jax.random.fold_in(kx, 1), (grid * tile_m, tile_n), jnp.float32)

    call = pl.pallas_call(
        functools.partial(_body_elem, reps=reps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_m, tile_n), lambda b: (b, 0)),
            pl.BlockSpec((tile_m, tile_n), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((grid * tile_m, tile_n), jnp.float32),
    )

    @jax.jit
    def f():
        def body(_, carry):
            out = call(X * (1.0 + 0.0 * carry), Y)
            return jnp.sum(out[0])

        return lax.fori_loop(0, chain, body, 0.0)

    pairs = float(tile_m * tile_n * reps * grid) * chain
    return f, pairs


# ------------------------------------------- reference: the laplace kernel
def laplace_rate(d=512, n=8192, k=8):
    from rlaopt_tpu.ops.kernel_pallas import kernel_matmat_pallas

    key = jax.random.PRNGKey(0)
    X1 = jax.random.normal(key, (n, d), jnp.float32)
    V0 = jax.random.normal(jax.random.fold_in(key, 2), (n, k), jnp.float32)

    @jax.jit
    def f():
        def body(_, v):
            out = kernel_matmat_pallas(
                "laplace", X1, X1, v, float(d) ** 0.5, 1.0
            )
            return out / jnp.linalg.norm(out)

        v = lax.fori_loop(0, 16, body, V0)
        return jnp.sum(v)

    pairs = float(n) * n * d * 16
    return f, pairs


def main():
    out = {}
    cases = {
        "xla_fused_loop": probe_xla(),
        "pallas_bcast_256x256": probe_pallas_bcast(),
        "pallas_bcast_512x1024": probe_pallas_bcast(
            tile_m=512, tile_n=1024, nb=16, chain=1500
        ),
        "pallas_bcast_256x1024": probe_pallas_bcast(
            tile_m=256, tile_n=1024, nb=32, chain=1500
        ),
        "pallas_elementwise": probe_pallas_elem(),
        "pallas_elem_512x1024": probe_pallas_elem(
            tile_m=512, tile_n=1024, reps=64, grid=8, chain=1500
        ),
        "laplace_kernel_d512": laplace_rate(),
    }
    for name, (f, pairs) in cases.items():
        dt = bench_scalar(f)
        out[name] = round(pairs / dt / 1e12, 4)
        print(f"{name}: {out[name]} Tpairs/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
