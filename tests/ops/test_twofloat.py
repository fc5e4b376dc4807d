"""Double-f32 arithmetic validation against float64.

The two-float layer backs the value-accurate ("value64") kernel residual
path — its whole purpose is beating the f32 kernel-value floor, so every
bound here is checked against f64 ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaopt_tpu.ops.twofloat import (
    tf_add,
    tf_add_f32,
    tf_exp,
    tf_mul_f32,
    tf_sqr_f32,
    two_prod,
    two_sum,
)


def _rand(key, n, lo, hi):
    return jax.random.uniform(
        key, (n,), jnp.float32, minval=lo, maxval=hi
    )


class TestErrorFreeTransforms:
    def test_two_sum_exact(self):
        key = jax.random.PRNGKey(0)
        a = _rand(key, 4096, -1e6, 1e6)
        b = _rand(jax.random.fold_in(key, 1), 4096, -1e-3, 1e-3)
        s, e = two_sum(a, b)
        exact = a.astype(jnp.float64) + b.astype(jnp.float64)
        got = s.astype(jnp.float64) + e.astype(jnp.float64)
        # TwoSum is exact: s + e == a + b in real arithmetic
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))

    def test_two_prod_exact(self):
        key = jax.random.PRNGKey(2)
        a = _rand(key, 4096, -100.0, 100.0)
        b = _rand(jax.random.fold_in(key, 1), 4096, -100.0, 100.0)
        p, e = two_prod(a, b)
        exact = a.astype(jnp.float64) * b.astype(jnp.float64)
        got = p.astype(jnp.float64) + e.astype(jnp.float64)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))

    def test_sqr_exact(self):
        key = jax.random.PRNGKey(3)
        a = _rand(key, 4096, -30.0, 30.0)
        p, e = tf_sqr_f32(a)
        exact = a.astype(jnp.float64) ** 2
        got = p.astype(jnp.float64) + e.astype(jnp.float64)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


class TestTwoFloatOps:
    def test_add_mul_accuracy(self):
        key = jax.random.PRNGKey(4)
        x64 = np.random.default_rng(0).uniform(-50, 50, 4096)
        y64 = np.random.default_rng(1).uniform(-50, 50, 4096)
        xh = x64.astype(np.float32)
        xl = (x64 - xh).astype(np.float32)
        yh = y64.astype(np.float32)
        yl = (y64 - yh).astype(np.float32)
        sh, sl = tf_add(
            jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl)
        )
        got = np.asarray(sh, np.float64) + np.asarray(sl, np.float64)
        # ground truth = sum of the REPRESENTED two-float values (xh+xl is
        # only a ~2^-48 approximation of x64 to begin with; under
        # cancellation that input quantization dominates any add error)
        exact = (
            xh.astype(np.float64) + xl.astype(np.float64)
            + yh.astype(np.float64) + yl.astype(np.float64)
        )
        rel = np.abs(got - exact) / np.maximum(np.abs(exact), 1e-30)
        assert rel.max() < 2**-45

        c = _rand(key, 4096, -3.0, 3.0)
        ph, plo = tf_mul_f32(jnp.asarray(xh), jnp.asarray(xl), c)
        exact = x64 * np.asarray(c, np.float64)
        got = np.asarray(ph, np.float64) + np.asarray(plo, np.float64)
        rel = np.abs(got - exact) / np.maximum(np.abs(exact), 1e-30)
        assert rel.max() < 2**-44


class TestTfExp:
    @pytest.mark.parametrize("lo,hi", [(-60.0, 0.0), (-5.0, 1.0), (-0.5, 0.5)])
    def test_exp_accuracy(self, lo, hi):
        """~3e-9 relative over the kernel-argument range (f32 exp: ~6e-8).

        Below x ~ -70 (exp(x) < 1e-30) the scaled low part goes f32-
        subnormal and accuracy degrades gracefully to f32 level, then to a
        clean underflow — negligible absolute error either way, covered by
        the graceful-degradation and underflow tests.
        """
        x64 = np.random.default_rng(7).uniform(lo, hi, 200_000)
        xh = x64.astype(np.float32)
        xl = (x64 - xh).astype(np.float32)
        eh, el = tf_exp(jnp.asarray(xh), jnp.asarray(xl))
        got = np.asarray(eh, np.float64) + np.asarray(el, np.float64)
        exact = np.exp(x64)
        rel = np.abs(got - exact) / exact
        assert rel.max() < 4e-9, f"max rel err {rel.max():.2e}"

    def test_exp_f32_input_path(self):
        """Plain-f32 arguments (lo=0) — the common kernel-distance case."""
        x = np.random.default_rng(9).uniform(-40, 0, 100_000).astype(np.float32)
        eh, el = tf_exp(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
        got = np.asarray(eh, np.float64) + np.asarray(el, np.float64)
        exact = np.exp(x.astype(np.float64))
        rel = np.abs(got - exact) / exact
        assert rel.max() < 4e-9

    def test_exp_graceful_below_1e30(self):
        """exp(x) < 1e-30: still f32-accurate (low part may underflow)."""
        x64 = np.random.default_rng(8).uniform(-85, -60, 50_000)
        xh = x64.astype(np.float32)
        xl = (x64 - xh).astype(np.float32)
        eh, el = tf_exp(jnp.asarray(xh), jnp.asarray(xl))
        got = np.asarray(eh, np.float64) + np.asarray(el, np.float64)
        exact = np.exp(x64)
        rel = np.abs(got - exact) / exact
        assert rel.max() < 2e-7

    def test_exp_underflow_clean(self):
        """Very negative arguments underflow to 0 without NaN/Inf."""
        x = jnp.asarray([-200.0, -150.0, -104.0], jnp.float32)
        eh, el = tf_exp(x, jnp.zeros_like(x))
        assert bool(jnp.all(jnp.isfinite(eh)))
        assert bool(jnp.all(jnp.isfinite(el)))
        assert float(jnp.max(jnp.abs(eh))) < 1e-38

    def test_exp_beats_f32(self):
        """The entire point: two-float exp must beat f32 exp by >10x."""
        x64 = np.random.default_rng(11).uniform(-30, 0, 100_000)
        x = x64.astype(np.float32)
        exact = np.exp(x.astype(np.float64))  # exp at the f32 argument
        f32_rel = np.abs(
            np.asarray(jnp.exp(jnp.asarray(x)), np.float64) - exact
        ) / exact
        eh, el = tf_exp(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
        tf_rel = np.abs(
            np.asarray(eh, np.float64) + np.asarray(el, np.float64) - exact
        ) / exact
        assert tf_rel.max() * 10 < max(f32_rel.max(), 1e-30)
