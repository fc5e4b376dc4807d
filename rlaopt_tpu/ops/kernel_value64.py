"""Value-accurate (double-f32) kernel Gram matvec — the certified-residual path.

``kernel_matmat_value64`` evaluates ``k(X1, X2) @ V`` with kernel VALUES
accurate to ~3e-9 relative (vs ~3e-7 for the plain f32 paths), returned as a
compensated ``(hi, lo)`` pair. This is what makes TRUE sub-1e-6 residuals
certifiable at n ~ 10^6 on TPU:

* an f32 solve converges to the f32-perturbed kernel's solution, so its real
  residual floors at the f32 kernel-value error no matter how the on-device
  metric is computed (measured 8.5e-6 at n=1e5);
* iterative refinement can push past that floor only if the residual is
  re-evaluated with more accurate kernel values;
* the host can do that in f64 — but takes hours at n=1M on a thin host, and
  the TPU's f64 emulation of ``exp`` measures ~0.6 Gexp/s (~30 min per
  residual at n=1M). This kernel does it in f32 hardware ops via two-float
  arithmetic (:mod:`rlaopt_tpu.ops.twofloat`): ~1000x the f64-emulation rate.

Structure mirrors the Laplace feature-blocked Pallas kernel
(``kernel_pallas._laplace_matmat``): grid (row tiles x col tiles x feature
blocks), two-float squared-distance scratch persisting across feature steps,
one contraction per column tile. Inputs are pre-scaled by the lengthscale in
f64 on the host and shipped as (hi, lo) f32 pairs, so ARD and scalar
lengthscales are exact to ~2^-48. All five reference kernel families are
supported (round 4): RBF/Matérn accumulate the squared distance, Laplace
the L1 distance (two-float |Δ|), with per-family sqrt/polynomial epilogues
(`tf_sqrt`, two-float Matérn polynomials). No reference analog — KeOps
evaluates in native f32/f64 CUDA
(`/root/reference/rlaopt/kernels/base.py:92-102`), a luxury bf16-era TPUs
don't have.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .twofloat import (
    tf_abs,
    tf_add,
    tf_add_f32,
    tf_exp,
    tf_mul,
    tf_mul_f32,
    tf_sqr_f32,
    tf_sqrt,
    two_prod,
    two_sum,
)


__all__ = ["kernel_matmat_value64", "VALUE64_MAX_D"]

# Feature-dim cap. The engine is feature-blocked (nb = ceil(d/fb) slabs of
# 32-64 lanes accumulate into the persistent two-float distance scratch), so
# nothing binds at the reference's d=100 (distributed PCG-KRR,
# /root/reference/experiments/distributed_krr_linsys_solve_test.py:20-48) —
# the round-4 d<=64 gate predated multi-slab support. 512 bounds the
# per-call X-chunk staging and keeps the two-float accumulation error
# (~nb·2^-48 relative) far below the ~3e-9 value grade; d=100/128 are
# host-f64-parity-tested (tests/ops/test_value64.py).
VALUE64_MAX_D = 512


def _commit(a, dev):
    """Stage an array on an explicit device (None = default placement)."""
    if dev is None:
        return jnp.asarray(a)
    return jax.device_put(a, dev)

# 1/3 as a two-float (the Matérn-5/2 polynomial's 5D²/3 term = t²/3 with
# t = √5·D, and t² = gamma·dist² is available pre-sqrt).
_THIRD_H = np.float32(1.0 / 3.0)
_THIRD_L = np.float32(1.0 / 3.0 - float(np.float32(1.0 / 3.0)))


def _feature_block(d: int) -> int:
    """Feature-slab width: multiple of 8 in [32, 64] minimizing padded work.

    Wide slabs keep the X tiles lane-efficient (8-lane tiles measured 150x
    slower); the cap bounds the unrolled two-float body (~30 ops/feature)
    to a size Mosaic compiles happily.
    """
    if d <= 32:
        return _round_up(d, 8) if d > 24 else 32  # never below 32 lanes
    return min(
        range(32, 72, 8), key=lambda fb: (_round_up(d, fb), -fb)
    )


def _body_f32(
    xh_ref, yh_ref, v_ref, o_ref, olo_ref,
    acc_ref, lo_ref, d2h_ref, d2l_ref, **kw,
):
    """Exact-f32-input variant (scalar lengthscale folded into gamma)."""
    _body(
        xh_ref, None, yh_ref, None, v_ref, o_ref, olo_ref,
        acc_ref, lo_ref, d2h_ref, d2l_ref, **kw,
    )


def _accumulate_distance_block(
    xh_ref, xl_ref, yh_ref, yl_ref, d2h_ref, d2l_ref, kind, debug_skip,
    f64_acc=False,
):
    """One feature block of the two-float distance accumulation.

    Laplace-style feature slabs: 8-lane X tiles were measured 150x slower
    than the >=32-lane layouts the Laplace/direct kernels use, so fb is
    >=32-ish (see _feature_block) and X blocks are (tm, fb) 2-D when one
    slab spans the whole feature axis, (1, tm, fb) 3-D otherwise.

    Per-feature terms land in N_ACC independent two-float partial
    accumulators (round-robin) that merge into the persistent d2 once
    per feature block: the per-feature accumulate is a ~8-op SERIAL
    vector-op chain, and with one accumulator it was the body's critical
    path (every other feature op has cross-feature ILP). Four interleaved
    chains keep the VPU pipeline fed.
    """
    xh = xh_ref[0] if xh_ref.ndim == 3 else xh_ref[:]
    xl = None if xl_ref is None else (
        xl_ref[0] if xl_ref.ndim == 3 else xl_ref[:]
    )
    yl_row = (lambda f: None) if yl_ref is None else (
        lambda f: yl_ref[f : f + 1, :]
    )
    if f64_acc:
        # interpret/XLA:CPU: the two-float chains below are NOT safe
        # under the CPU fusion emitter (nondeterministic reassociation
        # across compiles — measured ~6e-8 kernel-value error appearing
        # run-to-run); CPU has native f64, so accumulate the distance
        # exactly there instead. d2h_ref is f64 in this mode.
        f64 = jnp.float64
        x64 = xh.astype(f64)
        if xl is not None:
            x64 = x64 + xl.astype(f64)
        acc = d2h_ref[:]
        for f in range(0 if "dist" in debug_skip else xh.shape[1]):
            dh = x64[:, f : f + 1] - yh_ref[f : f + 1, :].astype(f64)
            if yl_ref is not None:
                dh = dh - yl_ref[f : f + 1, :].astype(f64)
            acc = acc + (jnp.abs(dh) if kind == "laplace" else dh * dh)
        d2h_ref[:] = acc
        return
    n_acc = 4
    nf = 0 if "dist" in debug_skip else xh.shape[1]
    parts = [
        (jnp.zeros_like(d2h_ref[:]), jnp.zeros_like(d2h_ref[:]))
        for _ in range(min(n_acc, max(nf, 1)))
    ]
    for f in range(nf):
        # diff as a two-float: exact TwoSum of the hi parts (+ lo parts
        # when the inputs are two-float, i.e. ARD/host-prescaled)
        dh, de = two_sum(xh[:, f : f + 1], -yh_ref[f : f + 1, :])
        if xl is None:
            dl = de  # inputs are exact f32: TwoSum captures everything
        else:
            dl = de + (xl[:, f : f + 1] - yl_row(f))
        if kind == "laplace":
            # L1 distance: |diff| accumulated as a two-float. The ARD
            # lo-part add can denormalize the pair, so renormalize
            # before the sign transfer (tf_abs assumes |lo|<=ulp(hi)/2).
            if xl is not None:
                dh, dl = two_sum(dh, dl)
            sh, sl = tf_abs(dh, dl)
        else:
            # diff^2 as a two-float: exact square of hi + first-order
            # cross term
            sh, sl = tf_sqr_f32(dh)
            sl = sl + 2.0 * (dh * dl)
        # accumulate (zero-padded features contribute exactly nothing)
        ah, al = parts[f % n_acc]
        ah, carry = two_sum(ah, sh)
        parts[f % n_acc] = (ah, al + (carry + sl))
    if nf:
        # pairwise-merge the partials, then fold into the persistent d2
        while len(parts) > 1:
            merged = []
            for i in range(0, len(parts) - 1, 2):
                merged.append(tf_add(*parts[i], *parts[i + 1]))
            if len(parts) % 2:
                merged.append(parts[-1])
            parts = merged
        bh, bl = parts[0]
        d2h, carry = two_sum(d2h_ref[:], bh)
        d2h_ref[:] = d2h
        d2l_ref[:] = d2l_ref[:] + (carry + bl)


def _family_epilogue(d2h, d2l, kind, gamma_h, gamma_l, debug_skip,
                     f64_acc=False):
    """Two-float kernel values (eh, el) from the accumulated distance.

    Family epilogues on the accumulated two-float distance (squared
    distance for the dot-path families, L1 for Laplace), gamma folding
    the scalar lengthscale (see the caller):
      rbf      exp(-g*D^2)          g = 1/(2 ls^2)
      laplace  exp(-g*L1)           g = 1/ls
      matern12 exp(-t)              t = sqrt(g*D^2), g = 1/ls^2
      matern32 (1+t)*exp(-t)        t = sqrt(g*D^2), g = 3/ls^2
      matern52 (1+t+t^2/3)*exp(-t)  t = sqrt(g*D^2), g = 5/ls^2
    (parity: rlaopt/kernels/standard.py:31-86)
    """
    if f64_acc:
        # native-f64 epilogue (see _accumulate_distance_block): returns
        # (v64, None) — consumers treat None el as "eh is already the
        # full-precision value"
        f64 = jnp.float64
        g = jnp.asarray(gamma_h, f64) + jnp.asarray(gamma_l, f64)
        if kind in ("rbf", "laplace"):
            arg = -g * d2h
            return (arg if "exp" in debug_skip else jnp.exp(arg)), None
        t = jnp.sqrt(g * d2h)
        if "exp" in debug_skip:
            return -t, None
        e = jnp.exp(-t)
        if kind == "matern32":
            e = (1.0 + t) * e
        elif kind == "matern52":
            e = (1.0 + t + g * d2h / 3.0) * e
        return e, None
    if kind in ("rbf", "laplace"):
        ah, al = tf_mul_f32(d2h, d2l, -gamma_h)
        al = al + d2h * -gamma_l
        if "exp" in debug_skip:
            return ah, al
        return tf_exp(ah, al)
    uh, ul = tf_mul_f32(d2h, d2l, gamma_h)
    ul = ul + d2h * gamma_l
    th, tl = tf_sqrt(uh, ul)
    if "exp" in debug_skip:
        eh, el = -th, -tl
    else:
        eh, el = tf_exp(-th, -tl)
    if kind == "matern32":
        ph_, pl_ = tf_add_f32(th, tl, jnp.float32(1.0))
        eh, el = tf_mul(ph_, pl_, eh, el)
    elif kind == "matern52":
        u3h, u3l = tf_mul_f32(uh, ul, _THIRD_H)
        u3l = u3l + uh * _THIRD_L
        ph_, pl_ = tf_add(th, tl, u3h, u3l)
        ph_, pl_ = tf_add_f32(ph_, pl_, jnp.float32(1.0))
        eh, el = tf_mul(ph_, pl_, eh, el)
    return eh, el


def _body(
    xh_ref, xl_ref, yh_ref, yl_ref, v_ref, o_ref, olo_ref,
    acc_ref, lo_ref, d2h_ref, d2l_ref, *, nj, nb, gamma_h, gamma_l,
    kind="rbf", debug_skip=(), f64_acc=False,
):
    j = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lo_ref[:] = jnp.zeros_like(lo_ref)

    @pl.when(b == 0)
    def _():
        d2h_ref[:] = jnp.zeros_like(d2h_ref)
        d2l_ref[:] = jnp.zeros_like(d2l_ref)

    _accumulate_distance_block(
        xh_ref, xl_ref, yh_ref, yl_ref, d2h_ref, d2l_ref, kind,
        debug_skip, f64_acc,
    )

    @pl.when(b == nb - 1)
    def _():
        eh, el = _family_epilogue(
            d2h_ref[:], d2l_ref[:], kind, gamma_h, gamma_l, debug_skip,
            f64_acc,
        )
        if "contract" in debug_skip:
            acc_ref[:, 0:1] += jnp.sum(eh, axis=1, keepdims=True)
            lo_ref[:, 0:1] += jnp.sum(el, axis=1, keepdims=True)
            return
        vt = v_ref[:]  # (k_p, tn): row c is RHS column c
        if f64_acc:
            # interpret/XLA:CPU: native-f64 contraction (see _body_pair64)
            v64 = eh  # the f64 epilogue returns the full-precision value
            for c in range(vt.shape[0]):
                acc_ref[:, c : c + 1] += jnp.sum(
                    v64 * vt[c : c + 1, :].astype(jnp.float64), axis=1,
                    keepdims=True,
                )
        else:
            # Compensated contraction: an MXU dot would accumulate in f32
            # and reintroduce ~eps·Σ|K·V| error (measured 4e-7 relative —
            # as bad as the f32 kernel values this path exists to beat).
            # TwoProd each product, then a TwoSum-compensated binary-tree
            # lane reduction.
            for c in range(vt.shape[0]):
                vrow = vt[c : c + 1, :]
                ph, pe = two_prod(eh, vrow)
                pe = pe + el * vrow
                hi_c, lo_c = _comp_lane_sum(ph, pe)
                a = acc_ref[:, c : c + 1]
                s, e = two_sum(a, hi_c)
                acc_ref[:, c : c + 1] = s
                lo_ref[:, c : c + 1] = lo_ref[:, c : c + 1] + (e + lo_c)

    @pl.when(jnp.logical_and(j == nj - 1, b == nb - 1))
    def _():
        if f64_acc:
            hi = acc_ref[:].astype(jnp.float32)
            o_ref[:] = hi
            olo_ref[:] = (
                acc_ref[:] - hi.astype(jnp.float64)
            ).astype(jnp.float32)
        else:
            o_ref[:] = acc_ref[:]
            olo_ref[:] = lo_ref[:]


def _comp_lane_sum(ph, pe):
    """Compensated sum over the lane axis: (tm, w) → (tm, 1) as (hi, lo).

    Pairwise halving with TwoSum at every level; level rounding errors and
    the running lo parts are folded in plain f32 (their own rounding is
    second-order, ~eps²·Σ). Requires w to be a power of two.
    """
    s, err = ph, pe
    w = s.shape[1]
    while w > 1:
        half = w // 2
        s, e = two_sum(s[:, :half], s[:, half:])
        err = err[:, :half] + err[:, half:] + e
        w = half
    return s, err


def _comp_sublane_sum(ph, pe):
    """Compensated sum over the sublane axis: (h, tn) → (1, tn)."""
    s, err = ph, pe
    h = s.shape[0]
    while h > 1:
        half = h // 2
        s, e = two_sum(s[:half, :], s[half:, :])
        err = err[:half, :] + err[half:, :] + e
        h = half
    return s, err


def _body_pair64(
    xh_ref, xl_ref, yh_ref, yl_ref, vjt_ref, vi_ref,
    o1_ref, o1lo_ref, o2_ref, o2lo_ref,
    acc_ref, lo_ref, d2h_ref, d2l_ref,
    *, nj, nb, gamma_h, gamma_l, kind="rbf", f64_acc=False,
):
    """Two-output value64 body: one two-float K_IJ evaluation serves both
    ``K@V_J → o1[I]`` and ``KᵀV_I → o2[J]`` — the symmetric pair trick
    (``kernel_pallas._body_pair``) applied to the certified-residual
    engine, where the ~850-op/pair two-float distance+exp work dwarfs the
    second contraction. The mirror output lives TRANSPOSED (k, C_J) so
    its per-tile writes are lane-aligned; its contraction is a
    compensated SUBLANE pairwise reduce (:func:`_comp_sublane_sum`).
    Both outputs are compensated (hi, lo) pairs, resident for the whole
    grid (constant index maps)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when(
        jnp.logical_and(jnp.logical_and(i == 0, j == 0), b == 0)
    )
    def _():
        o2_ref[:] = jnp.zeros_like(o2_ref)
        o2lo_ref[:] = jnp.zeros_like(o2lo_ref)

    @pl.when(jnp.logical_and(j == 0, b == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lo_ref[:] = jnp.zeros_like(lo_ref)

    @pl.when(b == 0)
    def _():
        d2h_ref[:] = jnp.zeros_like(d2h_ref)
        d2l_ref[:] = jnp.zeros_like(d2l_ref)

    _accumulate_distance_block(
        xh_ref, xl_ref, yh_ref, yl_ref, d2h_ref, d2l_ref, kind, (),
        f64_acc,
    )

    @pl.when(b == nb - 1)
    def _():
        eh, el = _family_epilogue(
            d2h_ref[:], d2l_ref[:], kind, gamma_h, gamma_l, (), f64_acc,
        )
        tn = eh.shape[1]
        vt = vjt_ref[:]  # (k, tn)
        vi = vi_ref[:]  # (tm, k)
        if f64_acc:
            # interpret/XLA:CPU path: the fused two-float reduce trees are
            # NOT safe under the CPU fusion emitter (measured: a composed
            # jit reassociates the slice-add tree, ~7e-8 error, barriers
            # ineffective — see RESULTS_r4.md). CPU has native f64: do the
            # whole evaluation in f64 (distance + epilogue + contraction).
            f64 = jnp.float64
            v64 = eh  # f64 epilogue output
            for c in range(vt.shape[0]):
                acc_ref[:, c : c + 1] += jnp.sum(
                    v64 * vt[c : c + 1, :].astype(f64), axis=1,
                    keepdims=True,
                )
                sl = pl.ds(j * tn, tn)
                o2_ref[c : c + 1, sl] += jnp.sum(
                    v64 * vi[:, c : c + 1].astype(f64), axis=0,
                    keepdims=True,
                )
        else:
            for c in range(vt.shape[0]):
                # forward: K @ V_J into the row accumulator (lane reduce)
                vrow = vt[c : c + 1, :]
                ph, pe = two_prod(eh, vrow)
                pe = pe + el * vrow
                hi_c, lo_c = _comp_lane_sum(ph, pe)
                a = acc_ref[:, c : c + 1]
                s, e = two_sum(a, hi_c)
                acc_ref[:, c : c + 1] = s
                lo_ref[:, c : c + 1] = lo_ref[:, c : c + 1] + (e + lo_c)
                # mirror: Kᵀ @ V_I into the resident (k, C_J) window
                vcol = vi[:, c : c + 1]
                mh, me = two_prod(eh, vcol)
                me = me + el * vcol
                mhi, mlo = _comp_sublane_sum(mh, me)
                sl = pl.ds(j * tn, tn)
                m = o2_ref[c : c + 1, sl]
                s2, e2 = two_sum(m, mhi)
                o2_ref[c : c + 1, sl] = s2
                o2lo_ref[c : c + 1, sl] = (
                    o2lo_ref[c : c + 1, sl] + (e2 + mlo)
                )

    @pl.when(jnp.logical_and(j == nj - 1, b == nb - 1))
    def _():
        if f64_acc:
            f64 = jnp.float64
            hi = acc_ref[:].astype(jnp.float32)
            o1_ref[:] = hi
            o1lo_ref[:] = (acc_ref[:] - hi.astype(f64)).astype(jnp.float32)
        else:
            o1_ref[:] = acc_ref[:]
            o1lo_ref[:] = lo_ref[:]


def _body_pair64_f32(
    xh_ref, yh_ref, vjt_ref, vi_ref,
    o1_ref, o1lo_ref, o2_ref, o2lo_ref,
    acc_ref, lo_ref, d2h_ref, d2l_ref, **kw,
):
    """Exact-f32-input variant of :func:`_body_pair64`."""
    _body_pair64(
        xh_ref, None, yh_ref, None, vjt_ref, vi_ref,
        o1_ref, o1lo_ref, o2_ref, o2lo_ref,
        acc_ref, lo_ref, d2h_ref, d2l_ref, **kw,
    )


def _value64_symmetric(
    Xh, Xl, V, gamma_h, gamma_l, kind, tile_m, tile_n, interpret,
    fb, chunk_rows=None, devices=None,
):
    """Symmetric (one-data-set) value64 driver: pair-chunk schedule.

    The Gram matrix is symmetric, so the n² two-float tile work — ~850
    VPU ops per pair, the dominant cost of a certified n=1M residual —
    can be HALVED by visiting each unordered chunk pair once: diagonal
    chunks run the plain square body, off-diagonal pairs run
    :func:`_body_pair64` (one K_IJ evaluation, both products). Chunk
    size targets the same ~2.5e9-pairs-per-call watchdog budget as the
    rectangular driver; per-chunk outputs are accumulated on the host
    in f64 (adding each call's compensated (hi, lo) — error ~2⁻⁵³ per
    add, far below the evaluation's own ~3e-9 value grade).
    Returns (OH, n_pad) with OH the (n_pad, k) f64 accumulator.
    """
    n_p0, d_p = Xh.shape
    k = V.shape[1]
    if chunk_rows is None:
        # per-call pair budget: sized to ~3-5 s of device time at the
        # measured ~3.5 Gpairs/s (the 2.5e9 budget dated from the
        # 0.76 Gpairs/s engine; at n=1M it cost 231 dispatch round-trips
        # through the ~20-40 ms tunnel)
        chunk_rows = int(1.2e10) ** 0.5
    chunk_rows = max(tile_n, int(chunk_rows) // tile_n * tile_n)
    # Balanced chunks: pick the chunk COUNT first, then size chunks to
    # n/nc — naively capping C at the watchdog budget padded n=2^16 by
    # 1.52x (phantom rows ran real tile work; measured 2x slower than
    # the rectangular driver instead of ~1.4x faster).
    nc0 = -(-n_p0 // chunk_rows)
    C = _round_up(-(-n_p0 // nc0), tile_n)
    n_pad = _round_up(n_p0, C)
    Xh = _pad_to(Xh, n_pad, d_p)
    if Xl is not None:
        Xl = _pad_to(Xl, n_pad, d_p)
    Vp = _pad_to(np.asarray(V, np.float32), n_pad, 1)
    nc = n_pad // C

    nb_feat = d_p // fb
    ni, njc = C // tile_m, C // tile_n
    # XLA:CPU (interpret) reassociates fused two-float reduce trees; use
    # native-f64 contraction there instead (see _body_pair64). Requires
    # x64; without it the two-float path stands (f32-grade risk on CPU
    # only — the Mosaic TPU path is measured exact either way).
    f64_acc = bool(interpret) and jax.config.jax_enable_x64
    acc_dtype = jnp.float64 if f64_acc else jnp.float32
    o2_dtype = jnp.float64 if f64_acc else jnp.float32

    def _xlayout(a):
        if nb_feat == 1:
            return a
        return np.ascontiguousarray(
            np.transpose(a.reshape(a.shape[0], nb_feat, fb), (1, 0, 2))
        )

    if nb_feat == 1:
        x_spec = pl.BlockSpec((tile_m, d_p), lambda i, j, b: (i, 0))
    else:
        x_spec = pl.BlockSpec((1, tile_m, fb), lambda i, j, b: (b, i, 0))
    y_spec = pl.BlockSpec((fb, tile_n), lambda i, j, b: (b, j))
    o_spec = pl.BlockSpec((tile_m, k), lambda i, j, b: (i, 0))
    vt_spec = pl.BlockSpec((k, tile_n), lambda i, j, b: (0, j))
    vi_spec = pl.BlockSpec((tile_m, k), lambda i, j, b: (i, 0))
    o2_spec = pl.BlockSpec((k, C), lambda i, j, b: (0, 0))
    scratch = [
        pltpu.VMEM((tile_m, k), acc_dtype),
        pltpu.VMEM((tile_m, k), jnp.float32),
        pltpu.VMEM((tile_m, tile_n), acc_dtype),
        pltpu.VMEM((tile_m, tile_n), jnp.float32),
    ]
    two_float_in = Xl is not None
    kw = dict(nj=njc, nb=nb_feat, gamma_h=gamma_h, gamma_l=gamma_l,
              kind=kind, f64_acc=f64_acc)
    diag_body = functools.partial(
        _body if two_float_in else _body_f32, debug_skip=(), **kw
    )
    pair_body = functools.partial(
        _body_pair64 if two_float_in else _body_pair64_f32, **kw
    )
    diag_specs = (
        [x_spec, x_spec, y_spec, y_spec, vt_spec]
        if two_float_in
        else [x_spec, y_spec, vt_spec]
    )
    pair_specs = (
        [x_spec, x_spec, y_spec, y_spec, vt_spec, vi_spec]
        if two_float_in
        else [x_spec, y_spec, vt_spec, vi_spec]
    )
    diag_call = pl.pallas_call(
        diag_body,
        grid=(ni, njc, nb_feat),
        in_specs=diag_specs,
        out_specs=[o_spec, o_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, k), jnp.float32),
            jax.ShapeDtypeStruct((C, k), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    pair_call = pl.pallas_call(
        pair_body,
        grid=(ni, njc, nb_feat),
        in_specs=pair_specs,
        out_specs=[o_spec, o_spec, o2_spec, o2_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, k), jnp.float32),
            jax.ShapeDtypeStruct((C, k), jnp.float32),
            jax.ShapeDtypeStruct((k, C), o2_dtype),
            jax.ShapeDtypeStruct((k, C), o2_dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # the o2 mirror window accumulates across i: no parallel dims
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )

    # Host-side numpy chunks; device staging happens lazily per (chunk,
    # device) through _at so a multi-device round-robin replicates only the
    # chunks each device actually touches.
    xs = [_xlayout(Xh[a * C : (a + 1) * C]) for a in range(nc)]
    xls = (
        [_xlayout(Xl[a * C : (a + 1) * C]) for a in range(nc)]
        if two_float_in
        else None
    )
    yts = [Xh[a * C : (a + 1) * C].T.copy() for a in range(nc)]
    ylts = (
        [Xl[a * C : (a + 1) * C].T.copy() for a in range(nc)]
        if two_float_in
        else None
    )
    vts = [Vp[a * C : (a + 1) * C].T.copy() for a in range(nc)]
    vis = [np.ascontiguousarray(Vp[a * C : (a + 1) * C]) for a in range(nc)]

    devs = list(devices) if devices else [None]
    nP = len(devs)
    _staged = {}

    def _at(tag, arrs, idx, dev_i):
        key = (tag, idx, dev_i)
        if key not in _staged:
            _staged[key] = _commit(arrs[idx], devs[dev_i])
        return _staged[key]

    # Issue every chunk-pair task (round-robin over the devices) before
    # fetching any output — see the rectangular driver's dispatch note.
    pending = []
    t = 0
    for a in range(nc):
        di = t % nP
        t += 1
        if two_float_in:
            h, l = diag_call(
                _at("x", xs, a, di), _at("xl", xls, a, di),
                _at("yt", yts, a, di), _at("ylt", ylts, a, di),
                _at("vt", vts, a, di),
            )
        else:
            h, l = diag_call(
                _at("x", xs, a, di), _at("yt", yts, a, di),
                _at("vt", vts, a, di),
            )
        pending.append((a, None, (h, l)))
        for b2 in range(a + 1, nc):
            di = t % nP
            t += 1
            if two_float_in:
                out = pair_call(
                    _at("x", xs, a, di), _at("xl", xls, a, di),
                    _at("yt", yts, b2, di), _at("ylt", ylts, b2, di),
                    _at("vt", vts, b2, di), _at("vi", vis, a, di),
                )
            else:
                out = pair_call(
                    _at("x", xs, a, di), _at("yt", yts, b2, di),
                    _at("vt", vts, b2, di), _at("vi", vis, a, di),
                )
            pending.append((a, b2, out))

    OH = np.zeros((n_pad, k), np.float64)
    for a, b2, out in pending:
        if b2 is None:
            h, l = out
            OH[a * C : (a + 1) * C] += np.asarray(
                h, np.float64
            ) + np.asarray(l, np.float64)
        else:
            o1h, o1l, o2h, o2l = out
            OH[a * C : (a + 1) * C] += (
                np.asarray(o1h, np.float64) + np.asarray(o1l, np.float64)
            )
            OH[b2 * C : (b2 + 1) * C] += (
                np.asarray(o2h, np.float64) + np.asarray(o2l, np.float64)
            ).T
    return OH


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_to(a, rows, cols):
    r = _round_up(a.shape[0], rows) - a.shape[0]
    c = _round_up(a.shape[1], cols) - a.shape[1]
    if r or c:
        a = np.pad(a, ((0, r), (0, c)))
    return a


def kernel_matmat_value64(
    X1,
    X2,
    V,
    lengthscale,
    const_scaling: float = 1.0,
    tile_m: int = 64,
    tile_n: int = 512,
    chunk_rows=None,
    interpret=None,
    kind: str = "rbf",
    symmetric=None,
    devices=None,
    _debug_skip=(),
):
    """``c·k(X1, X2) @ V`` with ~3e-9-accurate kernel values, any family.

    All five reference formulas (rlaopt/kernels/standard.py:31-86) are
    supported since round 4: rbf, laplace (two-float |Δ| accumulation),
    matern12/32/52 (two-float sqrt + polynomial epilogues on the
    accumulated squared distance).

    Eager (not jit-traceable): inputs are pulled to the host once for the
    exact f64 lengthscale pre-scaling; the compute runs as one Pallas call.
    Returns ``(hi, lo)`` f32 arrays — add ``lo`` last in consumers.

    ``symmetric`` (None = auto-detect ``X1 is X2``): one-data-set Gram
    products take the pair-chunk schedule (:func:`_value64_symmetric`) —
    each unordered chunk pair is evaluated once and serves both
    triangles, halving the dominant two-float tile work. An EXPLICIT
    ``symmetric=True`` with distinct buffers is validated on sampled rows
    (the pair-chunk driver reads X1 only — a wrong claim would silently
    return the Gram product of X1 alone).

    ``devices`` (optional list of jax devices — e.g. one mesh axis of a
    :class:`~rlaopt_tpu.kernels.sharded.ShardedKernelLinOp`): the
    host-orchestrated row chunks (and symmetric chunk-pair tasks) are
    issued round-robin across the devices, with the shared Y-side staged
    once per device, and all outputs fetched after the full dispatch —
    on a multi-chip mesh the certified sweep runs on every chip
    concurrently. None keeps the single-default-device behavior.

    Intended use: residual (re-)evaluation in mixed-precision refinement
    (`LinSys.solve(f64_refine_rounds=..., f64_refine_device="accel")`), not
    inner solve loops — it costs ~10x the exact-f32 tier.
    """
    if kind not in ("rbf", "laplace", "matern12", "matern32", "matern52"):
        raise ValueError(f"unknown kernel kind {kind!r}")
    if interpret is None:
        # Mosaic only lowers on TPU backends; elsewhere run interpreted
        # (CPU tests / debugging)
        from .kernel_dispatch import _on_tpu

        interpret = not _on_tpu()
    squeeze = np.ndim(V) == 1
    V = np.asarray(V, np.float32)
    if squeeze:
        V = V[:, None]
    n, d = X1.shape
    m = X2.shape[0]
    k = V.shape[1]
    if d > VALUE64_MAX_D:
        raise ValueError(
            f"value64 kernel supports d <= {VALUE64_MAX_D} (got d={d}); "
            "use the host f64 path for wider feature dims"
        )

    # Per-family gamma folding the scalar lengthscale into the epilogue
    # argument (see the _body epilogue comment): distance kernels use
    # gamma·D², laplace gamma·L1.
    _G_RAW = {
        "rbf": lambda ls: 1.0 / (2.0 * ls**2),
        "laplace": lambda ls: 1.0 / ls,
        "matern12": lambda ls: 1.0 / ls**2,
        "matern32": lambda ls: 3.0 / ls**2,
        "matern52": lambda ls: 5.0 / ls**2,
    }
    _G_SCALED = {
        "rbf": 0.5, "laplace": 1.0, "matern12": 1.0,
        "matern32": 3.0, "matern52": 5.0,
    }
    ls64 = np.asarray(lengthscale, np.float64)
    if ls64.ndim == 0:
        # scalar lengthscale: keep the raw f32 inputs EXACT (no lo parts,
        # ~25% fewer distance-loop ops and half the operand traffic) and
        # fold the per-family gamma into the epilogue as a two-float scalar
        Xh = np.asarray(X1, np.float32)
        Yh = np.asarray(X2, np.float32)
        Xl = Yl = None
        g64 = _G_RAW[kind](float(ls64))
    else:
        # ARD: pre-scale exactly in f64, ship (hi, lo) pairs
        Xs = np.asarray(X1, np.float64) / ls64
        Ys = np.asarray(X2, np.float64) / ls64
        Xh = Xs.astype(np.float32)
        Xl = (Xs - Xh).astype(np.float32)
        Yh = Ys.astype(np.float32)
        Yl = (Ys - Yh).astype(np.float32)
        g64 = _G_SCALED[kind]
    gamma_h = np.float32(g64)
    gamma_l = np.float32(g64 - float(gamma_h))

    if tile_n & (tile_n - 1):
        raise ValueError(f"tile_n must be a power of two, got {tile_n}")
    if tile_m & (tile_m - 1):
        # the symmetric pair body's mirror contraction halves the sublane
        # axis (_comp_sublane_sum); an odd intermediate width fails
        # mid-trace with a shape mismatch
        raise ValueError(f"tile_m must be a power of two, got {tile_m}")
    # no k padding: the compensated contraction loops real RHS columns, and
    # Mosaic accepts blocks spanning the whole (unpadded) k axis — padding
    # k=1 to 8 was measured to waste 8x of the contraction time
    k_p = k
    Vp = _pad_to(V, tile_n, 1)

    fb = _feature_block(d)
    if symmetric is None:
        symmetric = X1 is X2
    elif symmetric and X1 is not X2:
        # ADVICE r4: an explicit symmetric=True with distinct same-shaped
        # buffers would silently compute the Gram product of X1 alone.
        # Cheap sampled-row validation of the claim (full equality at
        # n=1M·d=100 is ~100 ms of host compare; 16 rows suffice to catch
        # any real mistake).
        X1h = np.asarray(X1)
        X2h = np.asarray(X2)
        if X1h.shape != X2h.shape:
            raise ValueError(
                "symmetric=True requires X1 and X2 to be the same data "
                f"set; got shapes {X1h.shape} vs {X2h.shape}"
            )
        idx = np.linspace(0, n - 1, num=min(16, n), dtype=np.int64)
        if not np.array_equal(X1h[idx], X2h[idx]):
            raise ValueError(
                "symmetric=True but X1 and X2 differ (checked 16 sampled "
                "rows); pass symmetric=False (or None) for distinct data"
            )
    if symmetric and not _debug_skip and n == m:
        Xh_s = _pad_to(Xh, 1, fb)
        Xl_s = None if Xl is None else _pad_to(Xl, 1, fb)
        OH = _value64_symmetric(
            Xh_s, Xl_s, V, gamma_h, gamma_l, kind, tile_m, tile_n,
            interpret, fb=fb, chunk_rows=chunk_rows, devices=devices,
        )
        # const scaling exactly in f64, then split back to the (hi, lo)
        # contract (error ~2^-53, below the evaluation's own grade)
        OH = OH[:n, :k] * float(const_scaling)
        hi32 = OH.astype(np.float32)
        lo32 = (OH - hi32).astype(np.float32)
        hi, lo = jnp.asarray(hi32), jnp.asarray(lo32)
        return (hi[:, 0], lo[:, 0]) if squeeze else (hi, lo)

    # Row-chunk the sweep: the runtime kills single device executions
    # longer than ~80 s, so cap each Pallas call at ~2.5e9 kernel pairs.
    # All per-call X chunks share one shape (one compile); the Y-side
    # preparation happens ONCE here — per-chunk Y re-prep at n=1M leaked
    # ~130 GB of host memory through 489 iterations before this refactor.
    if chunk_rows is None:
        # ~4 s of device time at the measured ~2.5 Gpairs/s (see the
        # symmetric driver's budget note)
        chunk_rows = max(tile_m, int(1.0e10) // max(m, 1))
    chunk_rows = min(_round_up(chunk_rows, tile_m), _round_up(n, tile_m))
    Xh = _pad_to(Xh, chunk_rows, fb)
    Yh = _pad_to(Yh, tile_n, fb)
    if Xl is not None:
        Xl = _pad_to(Xl, chunk_rows, fb)
        Yl = _pad_to(Yl, tile_n, fb)
    n_p, d_p = Xh.shape
    m_p = Yh.shape[0]
    ni, nj, nb = chunk_rows // tile_m, m_p // tile_n, d_p // fb

    # Y-side staged ONCE — per device when round-robining a mesh.
    devs = list(devices) if devices else [None]
    yh_np = Yh.T.copy()  # (d_p, m_p)
    yl_np = None if Xl is None else Yl.T.copy()
    vt_np = Vp.T.copy()
    y_per_dev = [
        (
            _commit(yh_np, dv),
            None if yl_np is None else _commit(yl_np, dv),
            _commit(vt_np, dv),
        )
        for dv in devs
    ]

    if nb == 1:
        # single slab spans the whole feature axis → plain 2-D blocks are
        # legal and fastest (no leading-unit-dim indexing in the hot loop)
        def _xlayout(a):
            return a

        x_spec = pl.BlockSpec((tile_m, d_p), lambda i, j, b: (i, 0))
    else:
        # feature slabs on a leading axis (Mosaic: trailing block dims must
        # divide 128 or span the axis)
        def _xlayout(a):
            return np.ascontiguousarray(
                np.transpose(a.reshape(a.shape[0], nb, fb), (1, 0, 2))
            )

        x_spec = pl.BlockSpec((1, tile_m, fb), lambda i, j, b: (b, i, 0))

    y_spec = pl.BlockSpec((fb, tile_n), lambda i, j, b: (b, j))
    o_spec = pl.BlockSpec((tile_m, k_p), lambda i, j, b: (i, 0))
    v_spec = pl.BlockSpec((k_p, tile_n), lambda i, j, b: (0, j))

    f64_acc = (
        bool(interpret) and jax.config.jax_enable_x64 and not _debug_skip
    )
    if Xl is None:
        body = functools.partial(
            _body_f32, nj=nj, nb=nb, gamma_h=gamma_h, gamma_l=gamma_l,
            kind=kind, debug_skip=_debug_skip, f64_acc=f64_acc,
        )
    else:
        body = functools.partial(
            _body, nj=nj, nb=nb, gamma_h=gamma_h, gamma_l=gamma_l,
            kind=kind, debug_skip=_debug_skip, f64_acc=f64_acc,
        )

    def _chunk_inputs(s0, dev_i):
        yh_in, yl_in, vt_in = y_per_dev[dev_i]
        dv = devs[dev_i]
        xh_c = _commit(_xlayout(Xh[s0 : s0 + chunk_rows]), dv)
        if Xl is None:
            return [xh_c, yh_in, vt_in]
        xl_c = _commit(_xlayout(Xl[s0 : s0 + chunk_rows]), dv)
        return [xh_c, xl_c, yh_in, yl_in, vt_in]

    in_specs = (
        [x_spec, y_spec, v_spec]
        if Xl is None
        else [x_spec, x_spec, y_spec, y_spec, v_spec]
    )
    call = pl.pallas_call(
        body,
        grid=(ni, nj, nb),
        in_specs=in_specs,
        out_specs=[o_spec, o_spec],
        out_shape=[
            jax.ShapeDtypeStruct((chunk_rows, k_p), jnp.float32),
            jax.ShapeDtypeStruct((chunk_rows, k_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (tile_m, k_p),
                jnp.float64 if f64_acc else jnp.float32,
            ),
            pltpu.VMEM((tile_m, k_p), jnp.float32),
            pltpu.VMEM(
                (tile_m, tile_n),
                jnp.float64 if f64_acc else jnp.float32,
            ),
            pltpu.VMEM((tile_m, tile_n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(35 * chunk_rows) * int(m_p) * int(d_p),
            bytes_accessed=(
                2 * (chunk_rows + m_p) * d_p + (m_p + 2 * chunk_rows) * k_p
            ) * 4,
            transcendentals=chunk_rows * m_p,
        ),
        interpret=interpret,
    )

    # Issue every chunk before fetching any: fetches synchronize, and on a
    # multi-device mesh the round-robined chunks overlap across chips (on
    # one device the dispatch queue pipelines them the same way). Outputs
    # are (chunk_rows, k) f32 pairs — small enough to defer at any n.
    handles = []
    for ci, s0 in enumerate(range(0, n_p, chunk_rows)):
        handles.append(call(*_chunk_inputs(s0, ci % len(devs))))
    his = [np.asarray(h) for h, _ in handles]
    los = [np.asarray(l) for _, l in handles]
    hi = jnp.asarray(np.concatenate(his, axis=0)[:n, :k])
    lo = jnp.asarray(np.concatenate(los, axis=0)[:n, :k])
    c = float(const_scaling)
    if c != 1.0:
        # scale in f64 on the host (eager path — hi/lo are materialized
        # anyway): the previous two-float scale used f32(c), whose
        # REPRESENTATION error (~2^-25·c, e.g. 2.4e-8 for c=0.83) leaked
        # straight into the values — above the evaluation's own ~3e-9
        # grade
        t = (np.asarray(hi, np.float64) + np.asarray(lo, np.float64)) * c
        hi32 = t.astype(np.float32)
        hi = jnp.asarray(hi32)
        lo = jnp.asarray((t - hi32).astype(np.float64).astype(np.float32))
    if squeeze:
        hi, lo = hi[:, 0], lo[:, 0]
    return hi, lo
