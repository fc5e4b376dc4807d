"""Hybrid ELL(+COO) format: the scatter-free accelerator path.

Conversion/apply parity against scipy dense oracles, the width/spill
heuristics, and the integration points (``sparse_aslinop(impl="ell")``,
``_SparseTensor.__matmul__`` with the env override, sharded rows). The
reference has no analog — its accelerator path is CUDA atomics
(``rlaopt/csrc/cuda/csc_matvec.cu``); ELL is the TPU re-design.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rlaopt_tpu.sparse import (
    SparseCSRTensor,
    csr_to_ell,
    ell_matmat,
    ell_matvec,
    sparse_aslinop,
)


def _rand_csr(m=57, n=41, density=0.15, seed=0, dtype=np.float32):
    return sp.random(
        m, n, density=density, format="csr", random_state=seed,
        dtype=np.float64,
    ).astype(dtype)


def _apply_oracle(A):
    D = A.toarray().astype(np.float64)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    X = np.stack([x, 2 * x, -x], axis=1)
    return D, x, X


class TestConversion:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matvec_matmat_parity(self, seed):
        A = _rand_csr(seed=seed)
        ell = csr_to_ell(A.data, A.indptr, A.indices)
        D, x, X = _apply_oracle(A)
        np.testing.assert_allclose(
            np.asarray(ell_matvec(ell, jnp.asarray(x)), np.float64),
            D @ x, atol=1e-5, rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(ell_matmat(ell, jnp.asarray(X)), np.float64),
            D @ X, atol=1e-5, rtol=0,
        )

    def test_empty_rows_and_empty_matrix(self):
        A = sp.csr_matrix((5, 7), dtype=np.float32)  # all-zero
        ell = csr_to_ell(A.data, A.indptr, A.indices)
        y = ell_matvec(ell, jnp.ones(7, jnp.float32))
        np.testing.assert_array_equal(np.asarray(y), np.zeros(5))

    def test_forced_width_spills_to_coo(self):
        # one long row forces a spill when the width is clamped below it
        A = sp.csr_matrix(
            np.vstack(
                [np.arange(1, 33, dtype=np.float32), np.zeros((3, 32))]
            )
        )
        ell = csr_to_ell(A.data, A.indptr, A.indices, width=8)
        assert ell["ell_values"].shape == (4, 8)
        assert "coo_values" in ell and ell["coo_values"].shape[0] == 24
        D, x, X = _apply_oracle(A)
        np.testing.assert_allclose(
            np.asarray(ell_matvec(ell, jnp.asarray(x)), np.float64),
            D @ x, atol=1e-4, rtol=0,
        )

    def test_skewed_rows_pick_quantile_width(self):
        # 999 rows of 2 nnz + one row of 500 nnz: full-width ELL would pad
        # 250x; the heuristic must clamp and spill instead.
        rows = [np.full(2, i) for i in range(999)] + [np.full(500, 999)]
        r = np.concatenate(rows).astype(np.int32)
        c = np.concatenate(
            [np.arange(2)] * 999 + [np.arange(500)]
        ).astype(np.int32)
        v = np.ones(len(r), np.float32)
        A = sp.csr_matrix((v, (r, c)), shape=(1000, 500))
        ell = csr_to_ell(A.data, A.indptr, A.indices)
        assert ell["ell_values"].shape[1] <= 16  # not 500
        assert "coo_values" in ell
        D, x, X = _apply_oracle(A)
        np.testing.assert_allclose(
            np.asarray(ell_matvec(ell, jnp.asarray(x)), np.float64),
            D @ x, atol=1e-4, rtol=0,
        )

    def test_affordable_full_width_avoids_spill(self):
        # 999 rows of 8 nnz + one of 16: the full width (16) pads only ~2x
        # the true nnz — inside max_pad_ratio — so the heuristic must take
        # it and produce NO COO spill (the quantile width 8 would spill).
        rows = [np.full(8, i) for i in range(999)] + [np.full(16, 999)]
        r = np.concatenate(rows).astype(np.int32)
        c = np.concatenate(
            [np.arange(8)] * 999 + [np.arange(16)]
        ).astype(np.int32)
        v = np.ones(len(r), np.float32)
        A = sp.csr_matrix((v, (r, c)), shape=(1000, 64))
        ell = csr_to_ell(A.data, A.indptr, A.indices)
        assert ell["ell_values"].shape[1] == 16
        assert "coo_values" not in ell
        D, x, X = _apply_oracle(A)
        np.testing.assert_allclose(
            np.asarray(ell_matvec(ell, jnp.asarray(x)), np.float64),
            D @ x, atol=1e-4, rtol=0,
        )

    def test_jit_scan_safe(self):
        import jax

        A = _rand_csr()
        ell = csr_to_ell(A.data, A.indptr, A.indices)
        x = jnp.linspace(-1, 1, A.shape[1], dtype=jnp.float32)

        @jax.jit
        def chain(ell, x):
            def body(c, _):
                y = ell_matvec(ell, x) * 0.0 + c
                return y, None

            out, _ = jax.lax.scan(body, jnp.zeros(A.shape[0]), length=3)
            return out

        assert np.all(np.isfinite(np.asarray(chain(ell, x))))


class TestIntegration:
    def test_aslinop_ell_matches_triplet(self):
        A = _rand_csr(seed=3)
        spt = SparseCSRTensor(A)
        op_e = sparse_aslinop(spt, impl="ell")
        op_t = sparse_aslinop(spt, impl="triplet")
        D, x, X = _apply_oracle(A)
        y = np.linspace(1, 2, A.shape[0]).astype(np.float32)
        for apply_e, apply_t, ref in [
            (op_e @ x, op_t @ x, D @ x),
            (op_e @ X, op_t @ X, D @ X),
            (op_e.T @ y, op_t.T @ y, D.T @ y),
        ]:
            np.testing.assert_allclose(
                np.asarray(apply_e, np.float64), ref, atol=1e-5, rtol=0
            )
            np.testing.assert_allclose(
                np.asarray(apply_e), np.asarray(apply_t), atol=1e-5, rtol=0
            )

    def test_aslinop_ell_csc_input(self):
        A = _rand_csr(seed=4)
        spt = SparseCSRTensor(A).T  # CSC view
        op = sparse_aslinop(spt, impl="ell")
        D = A.toarray().astype(np.float64).T
        x = np.linspace(-1, 1, D.shape[1]).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op @ x, np.float64), D @ x, atol=1e-5, rtol=0
        )

    def test_bad_impl_rejected(self):
        with pytest.raises(ValueError, match="impl"):
            sparse_aslinop(SparseCSRTensor(_rand_csr()), impl="cuda")

    def test_aslinop_laned_matches(self):
        """impl='laned': dynamic_gather format, interpret mode on CPU."""
        A = _rand_csr(m=50, n=700, density=0.03, seed=8)
        op = sparse_aslinop(SparseCSRTensor(A), impl="laned")
        D = A.toarray().astype(np.float64)
        x = np.linspace(-1, 1, 700).astype(np.float32)
        X = np.stack([x, -x], axis=1)
        y = np.linspace(0, 1, 50).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op @ x, np.float64), D @ x, atol=1e-5, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(op @ X, np.float64), D @ X, atol=1e-5, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(op.T @ y, np.float64), D.T @ y, atol=1e-5, rtol=0
        )

    def test_aslinop_dense_matches(self):
        """impl='dense': small data matrices ride the MXU (the accelerator
        has no hardware gather; densify whenever storage allows)."""
        A = _rand_csr(seed=7)
        op = sparse_aslinop(SparseCSRTensor(A), impl="dense")
        D, x, X = _apply_oracle(A)
        y = np.linspace(0, 1, A.shape[0]).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op @ x, np.float64), D @ x, atol=1e-5, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(op.T @ y, np.float64), D.T @ y, atol=1e-5, rtol=0
        )

    def test_tensor_matmul_env_override(self, monkeypatch):
        """RLAOPT_SPARSE_ELL=1 routes `@` through the ELL cache (on the CPU
        test backend the default is the triplet/native path)."""
        monkeypatch.setenv("RLAOPT_SPARSE_ELL", "1")
        A = _rand_csr(seed=5)
        spt = SparseCSRTensor(A)
        D, x, X = _apply_oracle(A)
        y = np.linspace(-2, 2, A.shape[0]).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(spt @ x, np.float64), D @ x, atol=1e-5, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(spt.T @ y, np.float64), D.T @ y, atol=1e-5, rtol=0
        )
        # both orientations cached on the SHARED dict (transpose view reuse)
        assert set(spt._ell_cache) == {"B", "BT"}
        assert spt.T._ell_cache is spt._ell_cache

    @pytest.mark.parametrize("impl", ["ell", "dense"])
    def test_shard_rows_payload_impls(self, impl):
        from rlaopt_tpu.parallel import make_mesh
        from rlaopt_tpu.sparse import sparse_shard_rows

        A = _rand_csr(m=61, n=36, seed=6)
        op = sparse_shard_rows(SparseCSRTensor(A), make_mesh(), impl=impl)
        D = A.toarray().astype(np.float64)
        x = np.linspace(-1, 1, 36).astype(np.float32)
        y = np.linspace(1, -1, 61).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op @ x, np.float64), D @ x, atol=1e-5, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(op.T @ y, np.float64), D.T @ y, atol=1e-5, rtol=0
        )
