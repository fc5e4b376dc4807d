"""On-chip study: how fast is ``exp`` really, and would a bit-trick beat it?

Two questions, both answered by VMEM-resident Pallas probes at engine tile
shapes (HBM-resident or XLA-fused-loop probes under-read compute rates —
the same failure the round-3 Laplace bound correction fixed):

1. **What is the native exp rate?** bench.py's earlier ``exp_peak`` (an
   XLA ``fori_loop`` chain over a (4096,4096) array) measured 0.139
   Texp/s and the round-3 config-4 narrative called the row oracle "AT
   the transcendental speed of light" against it. The Mosaic-lowered
   exp inside a Pallas body actually sustains **0.41–0.60 Texp/s**
   (~8–12 VPU-op equivalents) — the XLA probe under-read ~3×, so the
   row oracle is NOT exp-bound: its k=10 VPU contraction is the
   dominant term. bench.py now uses the Pallas probe.

2. **Would a polynomial/bit-trick exp be faster?** No — measured
   **5.7× SLOWER** (0.07–0.11 Texp/s). The candidate (Cody-Waite
   reduction + degree-5 minimax + exponent bit construction, ~14
   "ops", <=2.2e-7 relative — preserved below as ``fast_exp`` for
   reproducibility) loses because round/int-convert/shift/bitcast each
   cost far more than one VPU slot on this hardware, while the native
   exp is already near its op-mix bound. Measured 2026-08-19
   (min-of-3, time-shared chip):

   ===================  ==========  ==========
   tile shape           native      bit-trick
   ===================  ==========  ==========
   512x1024, grid 8     0.413       0.073
   256x256, grid 64     0.598       0.114
   ===================  ==========  ==========

Probe-design footnote (learned while turning this into bench.py's bound):
this script's body chains each rep through the previous rep's result per
element, which measures pipeline LATENCY, not throughput — the shipped
general d=28 kernel (whose per-value epilogues are independent) was then
measured BEATING a "bound" built the same dependent way by 1.5×.
bench.py's ``make_exp_peak``/``make_epilogue_bound`` therefore use
independent per-rep work (only a 1-op accumulate chain); the independent
style reads 0.578 Texp/s pure-exp and 0.358 Tvalues/s for the minimal
k=1 epilogue mix (sub, sub, exp, mul, add), with the shipped general
kernel at 0.93× of the latter. The native-vs-bit-trick conclusion is
unchanged (both candidates were probed with identical chain structure).

Run: python benchmarks/exp_probe_study.py   (CPU: interpret smoke only)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Honor JAX_PLATFORMS=cpu for the interpret smoke: the axon TPU plugin
# re-registers itself at import time, so the env var alone is ignored.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


# ------------------------------------------------------------------ fast_exp
# The losing candidate, kept for study reproducibility. exp(x) for f32
# x <= ~2 f32 ulp relative; clamps x (not the scaled exponent — a
# post-scale clamp leaves the reduced argument outside the fit range and
# the polynomial then returns garbage of either sign) to [-87, 87].
_LOG2E = 1.4426950408889634
_LN2_HI = 0.693359375  # exact in f32; Cody-Waite keeps f full-precision
_LN2_LO = -2.12194440e-4
# exp(f) on [-ln2/2, ln2/2], degree 5, max rel 7.5e-8 in exact arithmetic
_C = (1.00000007165345, 0.9999996919365479, 0.49998894859537424,
      0.16667574915626424, 0.0419153812960537, 0.00829764250565944)


def fast_exp(x):
    x = jnp.clip(x, -87.0, 87.0)
    i = jnp.round(x * jnp.float32(_LOG2E))
    f = x - i * jnp.float32(_LN2_HI) - i * jnp.float32(_LN2_LO)
    p = _C[0] + f * (
        _C[1] + f * (_C[2] + f * (_C[3] + f * (_C[4] + f * _C[5])))
    )
    scale = lax.bitcast_convert_type(
        lax.shift_left(i.astype(jnp.int32) + 127, jnp.int32(23)),
        jnp.float32,
    )
    return p * scale


def bench_scalar(f, trials=3):
    f().block_until_ready()
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        f().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _body(x_ref, y_ref, o_ref, *, reps, expfn):
    x = x_ref[:]
    y = y_ref[:]
    acc = y
    for _ in range(reps):
        # one exp per element per rep; -|.| keeps values in (0, 1] so the
        # chain neither saturates nor underflows
        acc = expfn(-jnp.abs(acc - x))
    o_ref[:] = acc


def probe(expfn, tile_m=512, tile_n=1024, reps=64, grid=8, chain=400,
          interpret=False):
    kx = jax.random.PRNGKey(0)
    X = jax.random.normal(kx, (grid * tile_m, tile_n), jnp.float32)
    Y = jax.random.normal(
        jax.random.fold_in(kx, 1), (grid * tile_m, tile_n), jnp.float32
    )

    call = pl.pallas_call(
        functools.partial(_body, reps=reps, expfn=expfn),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_m, tile_n), lambda b: (b, 0)),
            pl.BlockSpec((tile_m, tile_n), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((grid * tile_m, tile_n), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def f():
        def body(_, carry):
            out = call(X * (1.0 + 0.0 * carry), Y)
            return jnp.sum(out[0])

        return lax.fori_loop(0, chain, body, 0.0)

    n_exp = float(tile_m * tile_n * reps * grid) * chain
    return f, n_exp


def main():
    interpret = jax.default_backend() == "cpu"
    out = {}
    if interpret:
        tiny = dict(tile_m=8, tile_n=128, reps=2, grid=2, chain=2,
                    interpret=True)
        fn, _ = probe(jnp.exp, **tiny)
        fv, _ = probe(fast_exp, **tiny)
        assert abs(float(fn()) - float(fv())) < 1e-3
        print(json.dumps({"interpret_smoke": "ok"}))
        return
    cases = {
        "native_512x1024": probe(jnp.exp),
        "fast_512x1024": probe(fast_exp),
        "native_256x256": probe(jnp.exp, tile_m=256, tile_n=256, grid=64),
        "fast_256x256": probe(fast_exp, tile_m=256, tile_n=256, grid=64),
    }
    for name, (f, n_exp) in cases.items():
        dt = bench_scalar(f)
        out[name] = round(n_exp / dt / 1e12, 4)
        print(f"{name}: {out[name]} Texp/s", file=sys.stderr)
    out["speedup_512x1024"] = round(
        out["fast_512x1024"] / out["native_512x1024"], 3
    )
    out["speedup_256x256"] = round(out["fast_256x256"] / out["native_256x256"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
