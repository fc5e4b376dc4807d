"""Double-f32 ("two-float") arithmetic for value-accurate kernel evaluation.

A two-float represents a real number as an unevaluated sum ``hi + lo`` of two
f32 values with ``|lo| <= ulp(hi)/2``, giving ~48 significand bits — f64-class
precision out of f32 hardware ops. This matters on TPU: the VPU is f32-native
and XLA's f64 emulation of transcendentals runs ~1000x slower than f32 (the
measured exp rate on v5e is ~0.6 Gexp/s in f64 vs ~1 Texp/s in f32), so an
f64-grade kernel-Gram residual at n=10^6 (10^12 kernel values) is ONLY
feasible through this path.

All routines are branch-free elementwise jnp code, usable inside Pallas
bodies and in plain XLA. Error-free transformations follow Knuth (TwoSum),
Dekker (Split/TwoProd, FMA-free), and the double-single expansions of
Hida/Li/Bailey. No code in the reference corresponds to this module (KeOps
evaluates kernels in native f32/f64 CUDA; the TPU has no native f64 path to
lean on — SURVEY §2.2 N10).

Accuracy targets (validated in tests/ops/test_twofloat.py against f64):
* ``tf_add/tf_mul/tf_sqr``: ~2^-47 relative.
* ``tf_exp`` on [-90, 1]: <= 3e-9 relative measured (the f32 Taylor tail and
  the first-order lo-part correction each contribute ~5e-10) — 100x below
  the f32 exp's 6e-8 and enough for certified 1e-6 KRR residuals at n=1M.
"""

import jax
import jax.numpy as jnp
import numpy as np


__all__ = [
    "two_sum",
    "fast_two_sum",
    "split_f32",
    "two_prod",
    "tf_add",
    "tf_add_f32",
    "tf_mul",
    "tf_mul_f32",
    "tf_sqr_f32",
    "tf_abs",
    "tf_neg",
    "tf_exp",
    "tf_sqrt",
]

# numpy scalars, not jnp arrays: Pallas kernels reject captured traced
# constants, and numpy scalars fold into the op stream cleanly
_F32 = np.float32

# Dekker splitting constant for f32: 2^12 + 1 (24-bit significand).
_SPLIT = _F32(4097.0)

# log2(e) as a two-float (hi = f32(log2 e), lo = f32(log2 e - hi)).
_LOG2E_HI = _F32(1.4426950408889634)
_LOG2E_LO = _F32(1.4426950408889634 - 1.4426950216293335)
# ln 2 as a two-float.
_LN2_HI = _F32(0.6931471805599453)
_LN2_LO = _F32(0.6931471805599453 - 0.6931471824645996)


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Dekker FastTwoSum: requires |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split_f32(a):
    """Dekker split: a == hi + lo with 12-bit halves (exact products)."""
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Dekker TwoProd without FMA: p + e == a * b exactly (17 flops)."""
    p = a * b
    ah, al = split_f32(a)
    bh, bl = split_f32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def tf_add(xh, xl, yh, yl):
    """Two-float + two-float (accurate double-single add).

    The cheap "sloppy" variant (one TwoSum) loses relative accuracy under
    cancellation (measured 2.4e-12 on random ±50 sums); this two-TwoSum
    version holds ~2^-45 even when xh and yh cancel.
    """
    sh, se = two_sum(xh, yh)
    th, te = two_sum(xl, yl)
    c = se + th
    vh, vl = fast_two_sum(sh, c)
    w = te + vl
    return fast_two_sum(vh, w)


def tf_add_f32(xh, xl, y):
    """Two-float + f32."""
    sh, se = two_sum(xh, y)
    return fast_two_sum(sh, xl + se)


def tf_mul_f32(xh, xl, y):
    """Two-float * f32."""
    ph, pe = two_prod(xh, y)
    return fast_two_sum(ph, xl * y + pe)


def tf_sqr_f32(a):
    """a² of an f32 as a two-float (exact)."""
    p = a * a
    ah, al = split_f32(a)
    e = ((ah * ah - p) + 2.0 * (ah * al)) + al * al
    return p, e


def tf_mul(xh, xl, yh, yl):
    """Two-float * two-float (~2^-47 relative; xl·yl is second-order)."""
    ph, pe = two_prod(xh, yh)
    return fast_two_sum(ph, pe + (xh * yl + xl * yh))


def tf_abs(xh, xl):
    """|x| of a two-float. Normalized inputs (|lo| <= ulp(hi)/2) have
    lo == 0 whenever hi == 0, so the sign of hi decides both parts."""
    sgn = jnp.where(xh < 0, _F32(-1.0), _F32(1.0))
    return xh * sgn, xl * sgn


def tf_neg(xh, xl):
    return -xh, -xl


def tf_sqrt(xh, xl):
    """sqrt of a nonnegative two-float, as a two-float (~2^-48 relative).

    One Newton/Heron correction of the f32 sqrt: s = sqrt(hi);
    sqrt(x) ≈ s + (x − s²)/(2s), with x − s² computed exactly (s² is an
    exact two-float square) — standard double-single sqrt (Dekker 1971).
    x == 0 (exact on Gram diagonals: x − x = 0) returns (0, 0) through
    the guarded division.
    """
    s = jnp.sqrt(xh)
    ph, pe = tf_sqr_f32(s)
    num = ((xh - ph) - pe) + xl
    corr = num / jnp.where(s > 0, 2.0 * s, _F32(1.0))
    corr = jnp.where(s > 0, corr, _F32(0.0))
    return fast_two_sum(s, corr)


# Degree-7 minimax-style (Taylor) polynomial for 2^f on f ∈ [-0.5, 0.5]:
# 2^f = exp(f·ln2); Taylor in t = f·ln2 with |t| <= 0.347. The tail term
# t^8/8! <= 5.3e-9 is corrected by evaluating the two leading terms in
# two-float and the rest in plain f32 — the f32-evaluated tail contributes
# absolute error ~|t|^3·eps ~ 2e-9·eps, far below 2^-48.
_C2 = _F32(0.5)
# 1/6 as a two-float: its f32 rounding (~2e-8 relative) is a SMOOTH error
# in t — over the narrow argument ranges kernel distances concentrate in it
# acts as a bias that survives 2-norm concentration (measured as a ~4e-10
# correlated kernel-value bias before the split).
_C3H = _F32(1.0 / 6.0)
_C3L = _F32(1.0 / 6.0 - float(_F32(1.0 / 6.0)))
_C4 = _F32(1.0 / 24.0)
_C5 = _F32(1.0 / 120.0)
_C6 = _F32(1.0 / 720.0)
_C7 = _F32(1.0 / 5040.0)
_C8 = _F32(1.0 / 40320.0)
_C9 = _F32(1.0 / 362880.0)


def tf_exp(xh, xl):
    """exp of a two-float, as a two-float. Target range: x ∈ [-90, 1].

    Strategy: range-reduce with k = round(x·log2e), t = x − k·ln2 (computed
    in two-float: ln2's representation error would otherwise inject
    k·2^-31 ~ 3e-8 absolute into t, i.e. ~3e-8 relative into the result);
    exp(t) via Taylor with the quadratic-and-below terms carried in
    two-float; scale by 2^k through exponent arithmetic (exact).
    """
    f32 = _F32
    # k = nearest integer to x / ln2  (f32 rounding of the product is fine:
    # k is exactly representable and |x·log2e| < 2^7)
    k = jnp.round(xh * _LOG2E_HI)
    # t = x - k*ln2, two-float: k*ln2 as two-float (k exact integer ≤ 2^7 →
    # products with the ln2 parts are exact in f32 up to the lo·lo term)
    mh, ml = tf_mul_f32(_LN2_HI, _LN2_LO, k)
    th, tl = tf_add(xh, xl, -mh, -ml)
    # exp(t), |t| <= ln2/2 + tiny. Two-float Horner for the quadratic core:
    # e = 1 + t + t²/2 + t³·P(t) with P in plain f32 (error ~|t³|·eps).
    t = th  # f32 view, |tl| ~ 2^-25|t|
    q = _C9
    q = _C8 + q * t
    q = _C7 + q * t
    q = _C6 + q * t
    q = _C5 + q * t
    q = _C4 + q * t  # Q(t) ≈ (exp(t) - 1 - t - t²/2 - t³/6)/t⁴
    # t² and t³ in two-float (exact square; near-exact cube)
    s2h, s2l = tf_sqr_f32(t)
    c3h, c3l = tf_mul_f32(s2h, s2l, t)
    # cubic term with a TWO-FLOAT 1/6: the f32 coefficient rounding is a
    # smooth (bias-like) error over narrow kernel-argument ranges
    t3h, t3l = tf_mul_f32(c3h, c3l, _C3H)
    t3l = t3l + c3h * _C3L
    # quartic-and-up tail in plain f32 (|t⁴·Q| ≤ 6e-4 → abs err ~ 4e-11)
    tail = q * (s2h * s2h)
    # exp(th + tl) ≈ exp(th)·(1 + tl): carry tl·(1 + t + t²/2); the residual
    # tl·t³/6 is ≤ 7e-11 absolute
    tail = tail + tl * (f32(1.0) + t + _C2 * s2h)
    # e = 1 + t + t²/2 + t³/6 + tail, accumulated ascending in two-float
    eh, el = tf_add(t3h, t3l, s2h * _C2, s2l * _C2)
    eh, el = tf_add_f32(eh, el, tail)
    eh, el = tf_add(eh, el, th, f32(0.0))
    eh, el = tf_add_f32(eh, el, f32(1.0))
    # scale by 2^k exactly via exponent-field construction (jnp.exp2 is a
    # polynomial approximation on some backends and is NOT exact even at
    # integer arguments — measured 3.5e-7 relative at k=-51 on XLA:CPU).
    # Two hops keep each factor normal; k < -189 flushes to 0 through the
    # product, which is the correct kernel-value limit.
    k1 = jnp.maximum(k, f32(-63.0))
    k2 = jnp.maximum(k - k1, f32(-126.0))
    s1 = _exp2_int(k1)
    s2 = _exp2_int(k2)
    eh2 = eh * s1 * s2
    el2 = el * s1 * s2
    return eh2, el2


def _exp2_int(k):
    """Exact 2^k for integer-valued f32 ``k`` in [-126, 127] (bit twiddle)."""
    ki = k.astype(jnp.int32)
    bits = (ki + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)
