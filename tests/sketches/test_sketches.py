"""Sketch tests: shapes, orientation, isometry, sparse structure, SRHT.

Mirrors the reference's test conventions: dual-precision parametrization and
mathematical property assertions rather than golden files.
"""

import jax
import jax.numpy as jnp
import pytest

from rlaopt_tpu.linops import aslinop
from rlaopt_tpu.ops import fwht, fwht_butterfly, hadamard_matrix
from rlaopt_tpu.sketches import (
    SRHT,
    get_sketch,
    srht_apply,
    srht_matrix,
    srht_params,
)

S, D = 20, 64


@pytest.fixture(params=["gauss", "ortho", "sparse", "srht"])
def name(request):
    return request.param


class TestShapesAndOrientation:
    def test_left(self, name, dtype, key):
        sk = get_sketch(name, "left", S, D, dtype, key)
        assert sk.Omega_mat.shape == (S, D)
        A = jnp.ones((D, 3), dtype=dtype)
        assert sk._apply_left(A).shape == (S, 3)
        assert sk._apply_left_trans(jnp.ones((S, 3), dtype=dtype)).shape == (D, 3)

    def test_right(self, name, dtype, key):
        sk = get_sketch(name, "right", S, D, dtype, key)
        assert sk.Omega_mat.shape == (D, S)
        A = jnp.ones((3, D), dtype=dtype)
        assert sk._apply_right(A).shape == (3, S)
        assert sk._apply_right_trans(jnp.ones((3, S), dtype=dtype)).shape == (3, D)

    def test_invalid_name_mode(self, key):
        with pytest.raises(ValueError):
            get_sketch("bogus", "left", S, D, jnp.float32, key)
        with pytest.raises(ValueError):
            get_sketch("gauss", "sideways", S, D, jnp.float32, key)

    def test_invalid_size(self, key):
        with pytest.raises(ValueError):
            get_sketch("gauss", "left", -3, D, jnp.float32, key)


class TestProperties:
    def test_ortho_orthonormal(self, dtype, tol, key):
        sk = get_sketch("ortho", "right", S, D, dtype, key)
        Q = sk.Omega_mat  # (D, S)
        assert jnp.allclose(Q.T @ Q, jnp.eye(S, dtype=dtype), atol=100 * tol)

    def test_sparse_structure(self, dtype, key):
        sk = get_sketch("sparse", "left", S, D, dtype, key)
        Om = sk.Omega_mat
        nnz_per_col = jnp.sum(Om != 0, axis=0)
        assert jnp.all(nnz_per_col <= 8)
        assert jnp.all(nnz_per_col >= 1)
        vals = jnp.unique(jnp.abs(Om[Om != 0]))
        assert jnp.allclose(vals, 8**-0.5)

    def test_gauss_isometry_in_expectation(self, key):
        # E[Omega^T Omega] = I: average over many draws (vmapped)
        from rlaopt_tpu.sketches import gauss_embedding

        d, n = 10, 200
        keys = jax.random.split(key, n)
        Oms = jax.vmap(lambda k: gauss_embedding(k, 30, d, jnp.float64))(keys)
        acc = jnp.einsum("bsd,bse->de", Oms, Oms) / n
        assert jnp.allclose(acc, jnp.eye(d), atol=0.15)

    def test_apply_to_linop(self, dtype, tol, key):
        k1, k2 = jax.random.split(key)
        M = jax.random.normal(k1, (D, 5), dtype=dtype)
        A = aslinop(M)
        sk = get_sketch("gauss", "left", S, D, dtype, k2)
        got = sk._apply_left(A)
        assert jnp.allclose(got, sk.Omega_mat @ M, rtol=tol, atol=tol)


class TestFWHT:
    @pytest.mark.parametrize("p", [1, 2, 8, 64, 256])
    def test_matches_hadamard_matrix(self, p, dtype, tol, key):
        x = jax.random.normal(key, (p, 3), dtype=dtype)
        H = hadamard_matrix(p, dtype)
        want = H @ x
        assert jnp.allclose(fwht(x), want, rtol=100 * tol, atol=100 * tol)
        assert jnp.allclose(
            fwht_butterfly(x), want, rtol=100 * tol, atol=100 * tol
        )

    def test_axis(self, key):
        x = jax.random.normal(key, (3, 16), dtype=jnp.float64)
        assert jnp.allclose(fwht(x, axis=1), fwht(x.T).T, atol=1e-10)

    def test_non_pow2_raises(self):
        with pytest.raises(ValueError):
            fwht(jnp.ones((12, 2)))


class TestSRHT:
    def test_fast_apply_matches_matrix(self, dtype, tol, key):
        d = 50  # non-power-of-2: exercises padding
        signs, rows = srht_params(key, S, d, dtype)
        A = jax.random.normal(jax.random.fold_in(key, 1), (d, 4), dtype=dtype)
        Theta = srht_matrix(signs, rows, d)
        assert Theta.shape == (S, d)
        assert jnp.allclose(
            srht_apply(signs, rows, A), Theta @ A, rtol=100 * tol, atol=100 * tol
        )

    def test_isometry_in_expectation(self, key):
        d, n = 16, 300

        def one(k):
            signs, rows = srht_params(k, 12, d, jnp.float64)
            Th = srht_matrix(signs, rows, d)
            return Th.T @ Th

        acc = jnp.mean(jax.vmap(one)(jax.random.split(key, n)), axis=0)
        assert jnp.allclose(acc, jnp.eye(d), atol=0.2)

    def test_all_four_applies(self, dtype, tol, key):
        for mode in ["left", "right"]:
            sk = SRHT(mode, S, D, dtype, key)
            Om = sk.Omega_mat
            x_r = jnp.ones((Om.shape[1], 2), dtype=dtype)
            x_l = jnp.ones((3, Om.shape[0]), dtype=dtype)
            assert jnp.allclose(
                sk._apply_left(x_r), Om @ x_r, rtol=100 * tol, atol=100 * tol
            )
            assert jnp.allclose(
                sk._apply_right(x_l), x_l @ Om, rtol=100 * tol, atol=100 * tol
            )
            assert jnp.allclose(
                sk._apply_left_trans(jnp.ones((Om.shape[0], 2), dtype=dtype)),
                Om.T @ jnp.ones((Om.shape[0], 2), dtype=dtype),
                rtol=100 * tol,
                atol=100 * tol,
            )
            assert jnp.allclose(
                sk._apply_right_trans(jnp.ones((3, Om.shape[1]), dtype=dtype)),
                jnp.ones((3, Om.shape[1]), dtype=dtype) @ Om.T,
                rtol=100 * tol,
                atol=100 * tol,
            )
