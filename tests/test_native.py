"""Native C++ host-kernel contracts: equality with the numpy paths.

The native library (flashdeconv_tpu/native/host_kernels.cpp) replaces the
numpy implementations of the HVG moments and the CountSketch projection; it
must produce identical results (projection: bit-identical; moments: <=1 ULP
through log1p, identical selection downstream) and the package must work
with the library disabled.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from scipy import sparse

from flashdeconv_tpu import native
from flashdeconv_tpu.utils.graph import grid_coords


def _random_csr(n_rows=300, n_cols=500, density=0.05, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    Y = sparse.random(
        n_rows, n_cols, density=density, format="csr", random_state=42,
        data_rvs=lambda k: rng.exponential(3.0, k) + 1.0,
    )
    return Y.astype(dtype)


needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@needs_native
class TestNativeMoments:
    def test_matches_f64_math(self):
        """Native moments == f64 reference for float64 data (float32 data
        uses f32 intermediates — see test_f32_matches_numpy_f32_semantics)."""
        Y = _random_csr(dtype=np.float64)
        lib = np.maximum(
            np.asarray(Y.sum(axis=1)).ravel().astype(np.float64), 1.0
        )
        scale = 1e4 / lib

        nat = native.log1p_cpm_moments(Y, scale)
        if nat is None:
            pytest.skip("moments gated off (log1p self-test)")

        counts = np.diff(Y.indptr)
        vals = np.log1p(
            Y.data.astype(np.float64) * np.repeat(scale, counts)
        )
        ref_sum = np.bincount(Y.indices, weights=vals, minlength=Y.shape[1])
        ref_sq = np.bincount(Y.indices, weights=vals**2, minlength=Y.shape[1])
        np.testing.assert_allclose(nat[0], ref_sum, rtol=1e-13)
        np.testing.assert_allclose(nat[1], ref_sq, rtol=1e-13)

    def test_gene_selection_uses_native(self):
        """select_hvg gives identical indices with and without native."""
        from flashdeconv_tpu.utils.genes import select_hvg

        Y = _random_csr(n_rows=2000, n_cols=800, density=0.1, seed=3)
        idx_native = select_hvg(Y, n_top=200)
        idx_dense = select_hvg(Y.toarray(), n_top=200)
        np.testing.assert_array_equal(idx_native, idx_dense)

    def test_gene_selection_native_vs_fallback_large_f32(self):
        """Above the adaptive-block threshold (>2048 rows) with f32 data —
        the regime where native moments use multi-block reduction and the
        vectorized log1p — gene indices must still match the numpy
        fallback exactly (ULP-level moment wiggle must not flip ranks)."""
        import subprocess

        from flashdeconv_tpu.utils.genes import select_hvg

        Y = _random_csr(n_rows=12_000, n_cols=600, density=0.05, seed=9,
                        dtype=np.float32)
        idx_native = select_hvg(Y, n_top=150)

        code = (
            "import numpy as np\n"
            "from scipy import sparse\n"
            "from flashdeconv_tpu.utils.genes import select_hvg\n"
            "rng = np.random.default_rng(9)\n"
            "Y = sparse.random(12_000, 600, density=0.05, format='csr',"
            " random_state=42,"
            " data_rvs=lambda k: rng.exponential(3.0, k) + 1.0"
            ").astype(np.float32)\n"
            "np.save('/tmp/_hvg_fallback.npy', select_hvg(Y, n_top=150))\n"
        )
        env = dict(os.environ, FLASHDECONV_NO_NATIVE="1")
        subprocess.run([sys.executable, "-c", code], check=True, env=env)
        idx_fallback = np.load("/tmp/_hvg_fallback.npy")
        np.testing.assert_array_equal(idx_native, idx_fallback)

    def test_f32_matches_numpy_f32_semantics(self):
        """f32 CSR data -> f32 intermediates (the numpy float32 path),
        accumulated in f64; agreement is ULP-level through log1pf."""
        Y = _random_csr(n_rows=800, n_cols=400, dtype=np.float32, seed=7)
        lib = np.maximum(np.asarray(Y.sum(axis=1)).ravel(), 1.0)  # f32
        scale = (np.float32(1e4) / lib).astype(np.float32)

        nat = native.log1p_cpm_moments(Y, scale)
        if nat is None:
            pytest.skip("moments gated off")

        counts = np.diff(Y.indptr)
        vals = np.log1p(Y.data * np.repeat(scale, counts).astype(np.float32))
        assert vals.dtype == np.float32
        ref_sum = np.bincount(Y.indices, weights=vals, minlength=400)
        ref_sq = np.bincount(
            Y.indices, weights=vals * vals, minlength=400
        )
        np.testing.assert_allclose(nat[0], ref_sum, rtol=2e-6)
        np.testing.assert_allclose(nat[1], ref_sq, rtol=4e-6)

    def test_int64_indices(self):
        Y = _random_csr()
        Y.indices = Y.indices.astype(np.int64)
        Y.indptr = Y.indptr.astype(np.int64)
        lib = np.maximum(np.asarray(Y.sum(axis=1)).ravel(), 1.0)
        scale = 1e4 / lib
        nat = native.log1p_cpm_moments(Y, scale)
        if nat is None:
            pytest.skip("moments gated off")
        Y32 = _random_csr()
        ref = native.log1p_cpm_moments(Y32, scale)
        np.testing.assert_array_equal(nat[0], ref[0])


@needs_native
class TestNativeProjection:
    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_bitwise_vs_scipy(self, dtype):
        Y = _random_csr(n_rows=500, n_cols=300, dtype=dtype, seed=1)
        rng = np.random.default_rng(2)
        d = 64
        buckets = rng.integers(0, d, size=300).astype(np.int32)
        weights = rng.standard_normal(300)
        Om = sparse.csr_matrix(
            (weights, (np.arange(300), buckets)), shape=(300, d)
        )
        ref = np.asarray((Y @ Om).todense())
        nat = native.countsketch_project(Y, buckets, weights, d)
        np.testing.assert_array_equal(nat, ref)

    def test_sketch_data_native_path_matches_scipy(self):
        """sketch_data on sparse Y (native scatter) == dense Y (scipy path)."""
        from flashdeconv_tpu.core.sketching import sketch_data

        Y = _random_csr(n_rows=400, n_cols=600, density=0.08, seed=5)
        X = np.random.RandomState(0).gamma(2.0, 1.0, size=(6, 600))
        lev = np.random.RandomState(1).rand(600)
        lev /= lev.sum()

        Ys_sparse, Xs_sparse, _ = sketch_data(
            Y, X, sketch_dim=128, leverage_scores=lev, random_state=0,
            backend="host",
        )
        Ys_dense, Xs_dense, _ = sketch_data(
            np.asarray(Y.todense()), X, sketch_dim=128, leverage_scores=lev,
            random_state=0, backend="host",
        )
        np.testing.assert_allclose(Ys_sparse, Ys_dense, rtol=1e-10, atol=1e-12)
        np.testing.assert_array_equal(Xs_sparse, Xs_dense)


@needs_native
class TestNativeColumnSubset:
    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    @pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
    def test_bitwise_vs_scipy(self, dtype, idx_dtype):
        Y = _random_csr(n_rows=400, n_cols=700, dtype=dtype, seed=2)
        Y.indices = Y.indices.astype(idx_dtype)
        Y.indptr = Y.indptr.astype(idx_dtype)
        rng = np.random.default_rng(3)
        idx = np.sort(rng.choice(700, 180, replace=False))
        ref = Y[:, idx].tocsr()
        nat = native.csr_column_subset(Y, idx)
        assert nat is not None and nat.data.dtype == ref.data.dtype
        np.testing.assert_array_equal(nat.data, ref.data)
        np.testing.assert_array_equal(nat.indices, ref.indices)
        np.testing.assert_array_equal(
            np.asarray(nat.indptr, np.int64), np.asarray(ref.indptr, np.int64)
        )

    def test_int_dtype_falls_back(self):
        """Integer data must not be silently promoted — scipy keeps it."""
        Y = _random_csr(n_rows=50, n_cols=60)
        Y = sparse.csr_matrix(
            ((Y.data * 10).astype(np.int64) + 1, Y.indices, Y.indptr),
            shape=Y.shape,
        )
        assert native.csr_column_subset(Y, np.array([1, 5, 9])) is None

    def test_empty_matrix_and_empty_selection(self):
        Yz = sparse.csr_matrix((5, 10), dtype=np.float64)
        out = native.csr_column_subset(Yz, np.array([1, 3]))
        assert out.shape == (5, 2) and out.nnz == 0
        Y = _random_csr(n_rows=20, n_cols=30)
        out = native.csr_column_subset(Y, np.array([], dtype=np.int64))
        assert out.shape == (20, 0) and out.nnz == 0

    def test_pipeline_equals_scipy_subset_pipeline(self):
        """End-to-end fit with the native subset == the scipy-subset fit."""
        from flashdeconv_tpu import FlashDeconv

        rng = np.random.default_rng(11)
        N, G, K = 300, 400, 5
        X = rng.gamma(2.0, 1.0, size=(K, G)) * (rng.random((K, G)) < 0.4)
        props = rng.dirichlet(np.ones(K), size=N)
        mean = props @ X
        Y = sparse.csr_matrix(
            rng.poisson(mean / mean.sum(1, keepdims=True) * 800).astype(
                np.float64
            )
        )
        side = int(np.ceil(np.sqrt(N)))
        coords = grid_coords(N)

        kw = dict(sketch_dim=128, n_hvg=150, max_iter=25, random_state=0)
        P_native = FlashDeconv(**kw).fit_transform(Y, X, coords)

        import subprocess as sp
        import sys as _sys

        # Same fit with native disabled (fresh process so the loader cache
        # resets); proportions must match exactly — the subset is bitwise.
        code = (
            "import os; os.environ['FLASHDECONV_NO_NATIVE']='1'\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np\n"
            "from scipy import sparse\n"
            "from flashdeconv_tpu import FlashDeconv\n"
            "rng = np.random.default_rng(11)\n"
            "N, G, K = 300, 400, 5\n"
            "X = rng.gamma(2.0, 1.0, size=(K, G)) * (rng.random((K, G)) < 0.4)\n"
            "props = rng.dirichlet(np.ones(K), size=N)\n"
            "mean = props @ X\n"
            "Y = sparse.csr_matrix(rng.poisson(\n"
            "    mean / mean.sum(1, keepdims=True) * 800).astype(np.float64))\n"
            "side = int(np.ceil(np.sqrt(N)))\n"
            "xs, ys = np.meshgrid(np.arange(side), np.arange(side))\n"
            "coords = np.column_stack([xs.ravel(), ys.ravel()])[:N].astype(float)\n"
            "P = FlashDeconv(sketch_dim=128, n_hvg=150, max_iter=25,\n"
            "                random_state=0).fit_transform(Y, X, coords)\n"
            "np.save('/tmp/_subset_parity_P.npy', P)\n"
        )
        proc = sp.run([_sys.executable, "-c", code], capture_output=True,
                      text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        P_scipy = np.load("/tmp/_subset_parity_P.npy")
        np.testing.assert_allclose(P_native, P_scipy, rtol=1e-6, atol=1e-8)


@needs_native
class TestFusedKernels:
    """The single-pass fused kernels must equal their staged compositions
    bitwise (same precision, same accumulation order — the whole point)."""

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_moments_auto_equals_staged(self, dtype):
        Y = _random_csr(n_rows=1200, n_cols=400, dtype=dtype, seed=11)
        if native.log1p_cpm_moments_auto(Y) is None:
            pytest.skip("moments gated off (log1p self-test)")
        lib = native.csr_row_sums(Y)
        scale = 1e4 / np.maximum(lib, 1.0)
        staged = native.log1p_cpm_moments(Y, scale)
        fused = native.log1p_cpm_moments_auto(Y)
        np.testing.assert_array_equal(fused[0], staged[0])
        np.testing.assert_array_equal(fused[1], staged[1])

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_project_equals_staged(self, dtype):
        from flashdeconv_tpu.core.deconv import preprocess_data
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=900, n_cols=600, density=0.08, dtype=dtype,
                        seed=5)
        gene_idx = np.sort(
            np.random.RandomState(3).choice(600, size=180, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 64, random_state=0)

        fused = native.fused_log1pcpm_project(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim
        )
        if fused is None:
            pytest.skip("fused kernel gated off (log1p self-test)")

        Y_sub = native.csr_column_subset(Y, gene_idx)
        Y_tilde, _ = preprocess_data(
            Y_sub, np.ones((3, len(gene_idx))), "log_cpm"
        )
        staged = native.countsketch_project(
            Y_tilde, op.buckets, op.weights, op.sketch_dim
        )
        np.testing.assert_array_equal(fused, staged)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_xty_equals_sketch_then_gemm(self, dtype):
        """fused_log1pcpm_xty == (fused sketch) @ X_sketch.T and its
        Frobenius norm, to f64 dot-reassociation tolerance."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=700, n_cols=500, density=0.08, dtype=dtype,
                        seed=13)
        gene_idx = np.sort(
            np.random.RandomState(4).choice(500, size=160, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 64, random_state=1)
        Xsk = np.random.RandomState(5).standard_normal((7, 64))

        res = native.fused_log1pcpm_xty(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim, Xsk
        )
        if res is None:
            pytest.skip("fused kernel gated off (log1p self-test)")
        xty, yty = res

        sketch = native.fused_log1pcpm_project(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim
        )
        # dot-reassociation noise only (different but fixed accumulation
        # structure vs BLAS); relative error inflates on near-cancelling
        # entries, hence the atol
        np.testing.assert_allclose(
            xty, sketch @ Xsk.T, rtol=1e-10, atol=1e-11
        )
        np.testing.assert_allclose(
            yty, float(np.einsum("ij,ij->", sketch, sketch)), rtol=1e-12
        )

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_xty_chunks_bitwise(self, dtype):
        """The chunked streaming variant must produce bit-identical per-row
        Xty (rows are independent — zero-copy indptr-view ranges over the
        same buffers) and an additively equivalent YtY."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=701, n_cols=500, density=0.08, dtype=dtype,
                        seed=17)
        gene_idx = np.sort(
            np.random.RandomState(6).choice(500, size=150, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 64, random_state=2)
        Xsk = np.random.RandomState(7).standard_normal((6, 64))

        full = native.fused_log1pcpm_xty(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim, Xsk
        )
        if full is None:
            pytest.skip("fused kernel gated off (log1p self-test)")
        xty_full, yty_full = full

        chunks = native.fused_log1pcpm_xty_chunks(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim, Xsk,
            chunk_rows=128,  # uneven tail: 701 = 5*128 + 61
        )
        parts, yty = [], 0.0
        spans = []
        for a, b, xty_c, yty_c in chunks:
            spans.append((a, b))
            parts.append(xty_c)
            yty += yty_c
        assert spans[0] == (0, 128) and spans[-1] == (640, 701)
        np.testing.assert_array_equal(np.concatenate(parts), xty_full)
        np.testing.assert_allclose(yty, yty_full, rtol=1e-12)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    @pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
    def test_fused_xty_all_index_dtypes_and_contraction_paths(
        self, dtype, idx_dtype
    ):
        """Every (data, index) dtype combination of the vectorized subset
        scan (subset_compress has four AVX-512 overloads) AND both per-row
        contraction paths: sketch_dim=8 makes dense rows (kept-entry count
        m >= d -> classic memset + dense dots) while empty/sparse rows take
        the entry-wise SketchContract path. The fused project kernel is the
        staged-bitwise oracle; Xty/YtY compare at f64 reassociation
        tolerance."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=300, n_cols=200, density=0.2, dtype=dtype,
                        seed=23)
        Y.indices = Y.indices.astype(idx_dtype)
        # A few empty + near-empty rows exercise m == 0 and tail lanes.
        Y = Y.tolil()
        Y[0] = 0
        Y[7] = 0
        Y = Y.tocsr()
        Y.indices = Y.indices.astype(idx_dtype)
        gene_idx = np.sort(
            np.random.RandomState(8).choice(200, size=120, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 8, random_state=3)
        Xsk = np.random.RandomState(9).standard_normal((5, 8))

        res = native.fused_log1pcpm_xty(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim, Xsk
        )
        if res is None:
            pytest.skip("fused kernel gated off (log1p self-test)")
        xty, yty = res
        sketch = native.fused_log1pcpm_project(
            Y, gene_idx, op.buckets, op.weights, op.sketch_dim
        )
        # both dense (m >= 8) and sparse rows must exist for path coverage
        kept = np.isin(np.asarray(Y.indices), gene_idx)
        m_per_row = np.add.reduceat(kept, np.asarray(Y.indptr[:-1]))
        m_per_row[np.diff(Y.indptr) == 0] = 0
        assert (m_per_row >= 8).any() and (m_per_row < 8).any()
        np.testing.assert_allclose(xty, sketch @ Xsk.T, rtol=1e-10,
                                   atol=1e-11)
        np.testing.assert_allclose(
            yty, float(np.einsum("ij,ij->", sketch, sketch)), rtol=1e-12
        )

        # colscale family on the same operands (raw mode: colscale=None)
        res2 = native.fused_colscale_xty(
            Y, gene_idx, None, op.buckets, op.weights, op.sketch_dim, Xsk
        )
        if res2 is not None:
            sk2 = native.fused_colscale_project(
                Y, gene_idx, None, op.buckets, op.weights, op.sketch_dim
            )
            np.testing.assert_allclose(res2[0], sk2 @ Xsk.T, rtol=1e-10,
                                       atol=1e-11)

    # End-to-end coverage: TestNativeColumnSubset.
    # test_pipeline_equals_scipy_subset_pipeline compares a full fit through
    # this fused path against a FLASHDECONV_NO_NATIVE subprocess (pure
    # scipy staged pipeline) at rtol 1e-6.

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    @pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
    def test_subset_col_mean_bitwise(self, dtype, idx_dtype):
        """subset_col_mean must equal scipy's Y[:, idx].mean(axis=0)
        bit-for-bit (scipy scales each entry by 1/n in the data dtype, then
        column-sums in row-major nnz order in the data dtype — the kernel
        replays that association exactly)."""
        Y = _random_csr(n_rows=903, n_cols=600, density=0.08, dtype=dtype,
                        seed=21)
        Y.indices = Y.indices.astype(idx_dtype)
        gene_idx = np.sort(
            np.random.RandomState(9).choice(600, size=180, replace=False)
        )
        mine = native.subset_col_mean(Y, gene_idx)
        ref = np.asarray(Y[:, gene_idx].mean(axis=0)).ravel()
        assert mine.dtype == ref.dtype
        np.testing.assert_array_equal(mine, ref)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_colscale_project_pearson_bitwise_vs_scipy(self, dtype):
        """The pearson fused pass contains no libm, so unlike the log_cpm
        kernels it must be bit-identical to the STAGED SCIPY pipeline
        (subset -> preprocess_data('pearson') -> Omega matmul), not just
        the staged native one."""
        from flashdeconv_tpu.core.deconv import _pearson_sigma, preprocess_data
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=700, n_cols=500, density=0.08, dtype=dtype,
                        seed=23)
        gene_idx = np.sort(
            np.random.RandomState(10).choice(500, size=160, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 64, random_state=3)

        mu = np.asarray(Y[:, gene_idx].mean(axis=0)).ravel() + 1e-6
        colscale = 1.0 / _pearson_sigma(mu)
        fused = native.fused_colscale_project(
            Y, gene_idx, colscale, op.buckets, op.weights, op.sketch_dim
        )
        assert fused is not None

        Y_sub = Y[:, gene_idx].tocsr()
        Y_tilde, _ = preprocess_data(
            Y_sub, np.ones((3, len(gene_idx))), "pearson"
        )
        staged = np.asarray((Y_tilde @ op.to_csr()).todense())
        np.testing.assert_array_equal(fused, staged)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_colscale_project_raw_bitwise_vs_scipy(self, dtype):
        """colscale=None is the raw pipeline: subset -> astype(float64) ->
        project, bit-identical to the scipy staging."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=650, n_cols=500, density=0.08, dtype=dtype,
                        seed=29)
        gene_idx = np.sort(
            np.random.RandomState(11).choice(500, size=150, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 64, random_state=4)
        fused = native.fused_colscale_project(
            Y, gene_idx, None, op.buckets, op.weights, op.sketch_dim
        )
        assert fused is not None
        staged = np.asarray(
            (Y[:, gene_idx].astype(np.float64) @ op.to_csr()).todense()
        )
        np.testing.assert_array_equal(fused, staged)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_colscale_xty_equals_project_then_gemm(self, dtype):
        """fused_colscale_xty == (fused sketch) @ X_sketch.T to f64
        dot-reassociation tolerance; the chunked variant is bitwise equal
        per row and additively equivalent in YtY."""
        from flashdeconv_tpu.core.deconv import _pearson_sigma
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=701, n_cols=500, density=0.08, dtype=dtype,
                        seed=31)
        gene_idx = np.sort(
            np.random.RandomState(12).choice(500, size=150, replace=False)
        )
        op = make_countsketch_op(len(gene_idx), 64, random_state=5)
        Xsk = np.random.RandomState(13).standard_normal((6, 64))
        mu = np.asarray(Y[:, gene_idx].mean(axis=0)).ravel() + 1e-6
        colscale = 1.0 / _pearson_sigma(mu)

        res = native.fused_colscale_xty(
            Y, gene_idx, colscale, op.buckets, op.weights, op.sketch_dim,
            Xsk,
        )
        assert res is not None
        xty, yty = res
        sketch = native.fused_colscale_project(
            Y, gene_idx, colscale, op.buckets, op.weights, op.sketch_dim
        )
        np.testing.assert_allclose(xty, sketch @ Xsk.T, rtol=1e-10,
                                   atol=1e-11)
        np.testing.assert_allclose(
            yty, float(np.einsum("ij,ij->", sketch, sketch)), rtol=1e-12
        )

        chunks = native.fused_colscale_xty_chunks(
            Y, gene_idx, colscale, op.buckets, op.weights, op.sketch_dim,
            Xsk, chunk_rows=128,
        )
        parts, yty_c = [], 0.0
        for _, _, xty_chunk, yty_part in chunks:
            parts.append(xty_chunk)
            yty_c += yty_part
        np.testing.assert_array_equal(np.concatenate(parts), xty)
        np.testing.assert_allclose(yty_c, yty, rtol=1e-12)

    @pytest.mark.parametrize("method", ["pearson", "raw"])
    def test_fused_colscale_fit_equals_staged_sparse_fit(
        self, method, monkeypatch
    ):
        """A sparse-CSR fit through the fused colscale pipeline vs the
        staged sparse fit (subset -> scipy pearson multiply / astype ->
        projection). Sketch VALUES are bit-identical (the kernels replay
        scipy's exact precision and accumulation order), but the fused
        path contracts Xty with a fixed dot structure while the staged
        path runs a BLAS gemm — f64 reassociation noise (~1e-11 on Xty)
        perturbs the f64 trajectory at the last-ULP level, so the fit
        comparison is a tight allclose, not array_equal. Staged run forced
        by gating the colscale predicate off (gene selection stays native
        in both runs, so the comparison isolates preprocess+sketch)."""
        from conftest import make_synthetic

        from flashdeconv_tpu import FlashDeconv

        Y, X, coords, _ = make_synthetic(n_spots=120, n_genes=300, n_types=5)
        Ysp = sparse.csr_matrix(Y)
        kw = dict(
            sketch_dim=64, n_hvg=120, n_markers_per_type=10, random_state=0,
            max_iter=30, preprocess=method, solver_dtype=np.float64,
        )
        m_fused = FlashDeconv(**kw)
        P_fused = m_fused.fit_transform(Ysp, X, coords)

        monkeypatch.setattr(native, "colscale_available", lambda _Y: False)
        m_staged = FlashDeconv(**kw)
        P_staged = m_staged.fit_transform(Ysp, X, coords)

        np.testing.assert_allclose(P_fused, P_staged, rtol=1e-9, atol=1e-12)
        assert (
            m_fused.info_["n_iterations"] == m_staged.info_["n_iterations"]
        )

    def test_f32_moments_vector_log1p_extreme_range(self):
        """The f32 moments path (AVX2 vector log1p on x86) must agree with
        the correctly-rounded reference float(np.log1p(float64(x))) to <= 1
        ULP across magnitudes, including degenerate lanes mixed into valid
        groups (negative / inf / nan fall back to the same formula)."""
        vals = np.array(
            [0.0, 1e-30, 1e-10, 1e-4, 0.5, 1.0, 1.4142, 2.0, 1e3, 1e4,
             1e10, 1e30, 3.3e38, 7.0, 0.1, 0.9, 1.1, 123.456] * 5,
            dtype=np.float32,
        )
        n = vals.size
        Y = sparse.csr_matrix(
            (vals, np.arange(n) % 10, np.arange(0, n + 1)),
            shape=(n, 10),
        )
        scale = np.ones(n)  # identity scale: moments see log1p(vals)
        nat = native.log1p_cpm_moments(Y, scale)
        if nat is None:
            pytest.skip("moments gated off (log1p self-test)")

        ref_v = np.log1p(vals.astype(np.float64)).astype(np.float32)
        ref_sum = np.bincount(np.arange(n) % 10,
                              weights=ref_v.astype(np.float64), minlength=10)
        ref_sq = np.bincount(
            np.arange(n) % 10,
            weights=(ref_v * ref_v).astype(np.float64), minlength=10,
        )
        # each row contributes one f32 value; <=1 ULP per value keeps the
        # f64 sums inside ~1e-7 relative
        np.testing.assert_allclose(nat[0], ref_sum, rtol=3e-7)
        np.testing.assert_allclose(nat[1], ref_sq, rtol=6e-7)

        # degenerate values (x < -1 -> nan, -1 -> -inf) still flow through
        bad = np.array([-2.0, -1.0, np.nan, np.inf, 1.0] * 2,
                       dtype=np.float32)
        Yb = sparse.csr_matrix(
            (bad, np.arange(bad.size) % 5, np.arange(0, bad.size + 1)),
            shape=(bad.size, 5),
        )
        nb = native.log1p_cpm_moments(Yb, np.ones(bad.size))
        assert nb is not None
        assert not np.isfinite(nb[0]).all()  # nan/inf propagated, no crash


@needs_native
class TestGatesAndHelpers:
    def test_f32_log1p_selftest_matches_numpy(self):
        """The f32 kernels call libm log1pf — independently self-tested
        against numpy's float32 log1p (<= 1 ULP) at load. On this platform
        the gate must agree with a direct comparison."""
        import ctypes

        lib = native._load()
        x = np.concatenate(
            [
                np.random.default_rng(1).random(8192) * 1e4,
                np.random.default_rng(2).random(8192) * 1e-8,
                [0.0, 1.0],
            ]
        ).astype(np.float32)
        out = np.empty_like(x)
        lib.log1p_buffer_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(x.size),
        )
        ulp = np.abs(
            out.view(np.int32).astype(np.int64)
            - np.log1p(x).view(np.int32).astype(np.int64)
        )
        assert native._log1pf_matches_numpy == bool(ulp.max() <= 1)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_fused_available_is_authoritative(self, dtype):
        """fused_available(Y) == (the fused kernels run on Y): the pipeline
        relies on this equivalence (a None despite True is an error)."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Y = _random_csr(n_rows=50, n_cols=80, density=0.1, dtype=dtype)
        gene_idx = np.arange(0, 80, 2)
        op = make_countsketch_op(len(gene_idx), 16, random_state=0)
        ran = (
            native.fused_log1pcpm_project(
                Y, gene_idx, op.buckets, op.weights, op.sketch_dim
            )
            is not None
        )
        assert native.fused_available(Y) == ran
        # non-CSR and int dtypes are gated off
        assert not native.fused_available(Y.tocoo())
        assert not native.fused_available(
            sparse.csr_matrix(
                (np.ones(3, dtype=np.int32), [0, 1, 2], [0, 1, 2, 3]),
                shape=(3, 4),
            )
        )

    def test_all_csr_kernels_reject_non_csr_input(self):
        """Every public CSR-consuming kernel must return None — the
        documented 'unavailable' contract — for CSC and dense input
        instead of crashing: a CSC matrix has indptr/indices/data too,
        and its column pointers read as row indptr segfaulted the
        interpreter before the _is_csr guard (measured, exit 139);
        dense ndarrays died on `.data` being a memoryview."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Ycsr = _random_csr(n_rows=30, n_cols=40, density=0.2,
                           dtype=np.float64)
        gene_idx = np.arange(0, 40, 2)
        op = make_countsketch_op(len(gene_idx), 16, random_state=0)
        # countsketch_project is NOT subset-indexed: its operator must
        # cover every raw column of Y
        op_full = make_countsketch_op(40, 16, random_state=1)
        colscale = np.ones(len(gene_idx))
        Xsk = np.ones((3, 16))
        kernels = [
            lambda Y: native.log1p_cpm_moments(
                Y, np.ones(Y.shape[0])
            ),
            native.log1p_cpm_moments_auto,
            lambda Y: native.fused_log1pcpm_project(
                Y, gene_idx, op.buckets, op.weights, op.sketch_dim
            ),
            lambda Y: native.fused_log1pcpm_xty(
                Y, gene_idx, op.buckets, op.weights, op.sketch_dim, Xsk
            ),
            lambda Y: native.fused_log1pcpm_xty_chunks(
                Y, gene_idx, op.buckets, op.weights, op.sketch_dim, Xsk
            ),
            lambda Y: native.fused_colscale_project(
                Y, gene_idx, colscale, op.buckets, op.weights,
                op.sketch_dim
            ),
            lambda Y: native.fused_colscale_xty(
                Y, gene_idx, colscale, op.buckets, op.weights,
                op.sketch_dim, Xsk
            ),
            lambda Y: native.subset_col_mean(Y, gene_idx),
            native.csr_row_sums,
            lambda Y: native.log1p_cpm_transform(
                Y, np.ones(Y.shape[0])
            ),
            lambda Y: native.csr_column_subset(Y, gene_idx),
            lambda Y: native.countsketch_project(
                Y, op_full.buckets, op_full.weights, op_full.sketch_dim
            ),
        ]
        for i, fn in enumerate(kernels):
            assert fn(Ycsr.tocsc()) is None, f"kernel {i} accepted CSC"
            assert fn(np.asarray(Ycsr.todense())) is None, (
                f"kernel {i} accepted dense"
            )
            # sanity: the CSR fast path still engages (native loaded here)
            if native.available():
                assert fn(Ycsr) is not None, f"kernel {i} rejected CSR"
        # Undersized operators raise instead of corrupting the heap: the
        # C loops index buckets/weights with no bounds check.
        if native.available():
            with pytest.raises(ValueError, match="operator covers"):
                native.countsketch_project(
                    Ycsr, op.buckets, op.weights, op.sketch_dim
                )
            with pytest.raises(ValueError, match="operator covers"):
                native.fused_log1pcpm_xty(
                    Ycsr, gene_idx, op.buckets[:3], op.weights[:3],
                    op.sketch_dim, Xsk,
                )

    def test_colscale_xty_gate_agrees_on_int_dtype(self):
        """colscale_available(int CSR) is False, so fused_colscale_xty must
        return None for it too (gate and kernel agree in BOTH directions —
        no silent int->f64 promotion the staged scipy pipeline would not
        perform)."""
        from flashdeconv_tpu.core.sketching import make_countsketch_op

        Yint = sparse.csr_matrix(
            (np.arange(1, 7, dtype=np.int64),
             [0, 3, 1, 2, 0, 3], [0, 2, 4, 6]),
            shape=(3, 4),
        )
        gene_idx = np.arange(4)
        op = make_countsketch_op(4, 8, random_state=0)
        assert not native.colscale_available(Yint)
        assert native.fused_colscale_xty(
            Yint, gene_idx, None, op.buckets, op.weights, op.sketch_dim,
            np.ones((2, 8)),
        ) is None
        assert native.fused_colscale_xty_chunks(
            Yint, gene_idx, None, op.buckets, op.weights, op.sketch_dim,
            np.ones((2, 8)),
        ) is None

    def test_moments_gate_follows_dispatched_dtype(self):
        """The f32 moments kernels run the f32 log1p path — they must be
        gated on the f32 self-test, not the f64 one (and vice versa)."""
        Y32 = _random_csr(n_rows=20, n_cols=30, density=0.2,
                          dtype=np.float32)
        native._load()
        saved32, saved64 = (
            native._log1pf_matches_numpy, native._log1p_matches_numpy
        )
        try:
            native._log1pf_matches_numpy = False
            native._log1p_matches_numpy = True
            assert native.log1p_cpm_moments_auto(Y32) is None
            assert native.log1p_cpm_moments(
                Y32, np.ones(Y32.shape[0])
            ) is None
            # f64 data unaffected by the f32 gate
            if native.available():
                assert native.log1p_cpm_moments_auto(
                    Y32.astype(np.float64)
                ) is not None
        finally:
            native._log1pf_matches_numpy = saved32
            native._log1p_matches_numpy = saved64

    def test_zero_fill_rejects_noncontiguous(self):
        """zero_fill must refuse strided views (zeroing a temp copy and
        reporting success would leave the caller's array untouched)."""
        arr = np.ones(64, dtype=np.float64)
        view = arr[::2]
        assert native.zero_fill(view) is False
        assert np.all(view == 1.0)  # untouched
        assert native.zero_fill(arr) is True
        assert np.all(arr == 0.0)

    def test_yty_f64_matches_einsum(self):
        """yty_f64 == einsum on small inputs (exact policy below the
        atlas-scale threshold) and stays finite/close above it is covered
        by the solver tests; here, exact equality on the small path."""
        rng = np.random.default_rng(3)
        Y = rng.standard_normal((100, 64))
        assert native.yty_f64(Y) == float(np.einsum("ij,ij->", Y, Y))


class TestNativeDisabled:
    def test_pipeline_works_without_native(self):
        """FLASHDECONV_NO_NATIVE=1 must leave every caller on the numpy
        path with identical gene selection (subprocess so the loader's
        module-level cache is fresh)."""
        code = (
            "import os; os.environ['FLASHDECONV_NO_NATIVE'] = '1'\n"
            "import numpy as np\n"
            "from scipy import sparse\n"
            "from flashdeconv_tpu import native\n"
            "assert not native.available()\n"
            "assert native.log1p_cpm_moments(None, None) is None\n"
            "from flashdeconv_tpu.utils.genes import select_hvg\n"
            "rng = np.random.default_rng(0)\n"
            "Y = sparse.random(500, 300, density=0.1, format='csr',\n"
            "                  random_state=1,\n"
            "                  data_rvs=lambda k: rng.exponential(3.0, k)+1)\n"
            "idx = select_hvg(Y, n_top=50)\n"
            "print('OK', len(idx))\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr
        assert "OK 50" in proc.stdout
