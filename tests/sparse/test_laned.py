"""Lane-aligned format: conversion + Pallas matvec (interpret mode on CPU).

The on-chip throughput claim is benched separately; these tests pin the
format's correctness invariants: lane alignment, level assignment, spill
semantics, padding, and end-to-end matvec parity vs dense oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rlaopt_tpu.sparse.laned import LANE, csr_to_laned, laned_matvec


def _rand_csr(m, n, density, seed=0):
    return sp.random(
        m, n, density=density, format="csr", random_state=seed,
        dtype=np.float64,
    ).astype(np.float32)


def _mv(A, x, **kw):
    laned = csr_to_laned(A.data, A.indptr, A.indices, A.shape[1], **kw)
    return laned, np.asarray(
        laned_matvec(laned, jnp.asarray(x), A.shape[0], interpret=True),
        np.float64,
    )


class TestConversion:
    def test_lane_alignment_invariant(self):
        A = _rand_csr(40, 700, 0.05, seed=1)
        laned = csr_to_laned(A.data, A.indptr, A.indices, A.shape[1])
        q = np.asarray(laned["q"])
        v = np.asarray(laned["v"])
        T = q.shape[0] // A.shape[0]
        # every nonzero slot's reconstructed column ≡ its lane (mod 128)
        rows, lanes = np.nonzero(v)
        cols = (q[rows, lanes].astype(np.int64) << 7) + lanes
        D = A.toarray()
        out_rows = rows // T
        np.testing.assert_allclose(
            v[rows, lanes], D[out_rows, cols], rtol=0, atol=0
        )

    def test_spill_when_levels_capped(self):
        # one row with every entry in the same lane: columns ≡ 0 (mod 128)
        n_cols = 128 * 10
        cols = np.arange(10) * 128
        A = sp.csr_matrix(
            (np.arange(1, 11, dtype=np.float32),
             (np.zeros(10, np.int64), cols)),
            shape=(3, n_cols),
        )
        laned = csr_to_laned(
            A.data, A.indptr, A.indices, n_cols, max_levels=4,
            spill_target=0.0,
        )
        assert laned["q"].shape[0] // 3 == 4  # capped at max_levels
        assert "coo_values" in laned and laned["coo_values"].shape[0] == 6
        x = np.linspace(-1, 1, n_cols).astype(np.float32)
        _, y = _mv(A, x, max_levels=4, spill_target=0.0)
        np.testing.assert_allclose(
            y, A.toarray().astype(np.float64) @ x, atol=1e-5, rtol=0
        )


class TestMatvec:
    @pytest.mark.parametrize(
        "m,n,density,seed",
        [
            (60, 500, 0.05, 0),
            (33, 1300, 0.02, 1),     # non-multiple-of-128 columns
            (128, 128, 0.3, 2),      # dense-ish single-tile table
            (517, 4096, 0.004, 3),   # ragged rows, wide table
        ],
    )
    def test_matches_dense(self, m, n, density, seed):
        A = _rand_csr(m, n, density, seed=seed)
        x = np.random.default_rng(seed).standard_normal(n).astype(np.float32)
        _, y = _mv(A, x)
        np.testing.assert_allclose(
            y, A.toarray().astype(np.float64) @ x, atol=1e-4, rtol=0
        )

    def test_empty_matrix(self):
        A = sp.csr_matrix((5, 300), dtype=np.float32)
        x = np.ones(300, np.float32)
        _, y = _mv(A, x)
        np.testing.assert_array_equal(y, np.zeros(5))

    def test_jit_scan_safe(self):
        import jax

        A = _rand_csr(64, 400, 0.05, seed=4)
        laned = csr_to_laned(A.data, A.indptr, A.indices, A.shape[1])
        x = jnp.linspace(-1, 1, 400, dtype=jnp.float32)

        @jax.jit
        def chain(laned, x):
            def body(c, _):
                y = laned_matvec(laned, x, 64, interpret=True)
                return c + jnp.sum(y), None

            out, _ = jax.lax.scan(body, 0.0, length=2)
            return out

        ref = 2.0 * float(np.sum(A.toarray() @ np.asarray(x)))
        assert np.isclose(float(chain(laned, x)), ref, rtol=1e-4)

    def test_tpu_table_limit_guard(self):
        """On-chip (non-interpret) use beyond one table vreg raises the
        measured Mosaic limit (n_cols <= 1024) as a clear ValueError
        instead of a Mosaic internal error (round-3 on-chip finding)."""
        import pytest

        A = _rand_csr(16, 2048, 0.01, seed=5)
        laned = csr_to_laned(A.data, A.indptr, A.indices, A.shape[1])
        x = jnp.ones(2048, dtype=jnp.float32)
        with pytest.raises(ValueError, match="one vreg|n_cols"):
            laned_matvec(laned, x, 16, interpret=False)
