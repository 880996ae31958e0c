"""Auxiliary subsystems: stage timings, warm start, checkpoint save/load."""

import numpy as np
import pytest

from tests.conftest import make_synthetic

from flashdeconv_tpu import FlashDeconv
from flashdeconv_tpu.utils.timing import StageTimer, trace


_FIT_KWARGS = dict(
    sketch_dim=128, n_hvg=300, n_markers_per_type=10, random_state=0
)


class TestStageTimer:
    def test_collects_stages(self):
        timer = StageTimer()
        with timer.stage("a"):
            pass
        with timer.stage("b"):
            pass
        assert set(timer.timings) == {"a", "b"}
        assert all(v >= 0 for v in timer.timings.values())
        assert timer.total == pytest.approx(sum(timer.timings.values()))

    def test_accumulates_repeated_stage(self):
        timer = StageTimer()
        for _ in range(3):
            with timer.stage("x"):
                pass
        assert len(timer.timings) == 1

    def test_report_format(self):
        timer = StageTimer()
        with timer.stage("solve"):
            pass
        rep = timer.report()
        assert "solve" in rep and "total" in rep

    def test_trace_noop_without_dir(self, monkeypatch):
        monkeypatch.delenv("FLASHDECONV_TRACE_DIR", raising=False)
        with trace("stage"):
            pass  # must not require jax.profiler


class TestFitTimings:
    def test_fit_records_timings(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(**_FIT_KWARGS).fit(Y, X, coords)
        assert set(model.timings_) >= {
            "gene_selection", "preprocess", "sketch", "spatial_graph",
            "lambda_tuning", "solve",
        }


class TestWarmStart:
    def test_warm_start_reduces_iterations(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(warm_start=True, **_FIT_KWARGS)
        model.fit(Y, X, coords)
        n_cold = model.info_["n_iterations"]
        p_cold = model.proportions_.copy()

        model.fit(Y, X, coords)  # re-fit from the previous beta_
        assert model.info_["n_iterations"] <= max(n_cold // 2, 2)
        np.testing.assert_allclose(model.proportions_, p_cold, atol=1e-3)

    def test_beta_init_solver_api(self):
        from scipy import sparse
        from flashdeconv_tpu.core.solver import bcd_solve

        rng = np.random.RandomState(0)
        n, k, d = 50, 4, 16
        Xs = rng.randn(k, d)
        Ys = np.abs(rng.randn(n, k)) @ Xs
        A = sparse.eye(n, format="csr") * 0  # empty graph
        beta1, info1 = bcd_solve(Ys, Xs, A, lambda_=0.0, rho=0.0)
        beta2, info2 = bcd_solve(
            Ys, Xs, A, lambda_=0.0, rho=0.0, beta_init=beta1
        )
        assert info2["n_iterations"] <= info1["n_iterations"]
        np.testing.assert_allclose(beta2, beta1, atol=1e-4)

    def test_beta_init_shape_validated(self):
        from scipy import sparse
        from flashdeconv_tpu.core.solver import bcd_solve

        rng = np.random.RandomState(0)
        Xs = rng.randn(3, 8)
        Ys = rng.randn(10, 8)
        A = sparse.csr_matrix((10, 10))
        with pytest.raises(ValueError, match="beta_init"):
            bcd_solve(Ys, Xs, A, beta_init=np.zeros((5, 3)))


class TestCheckpoint:
    def test_save_load_roundtrip(self, synthetic_small, tmp_path):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(**_FIT_KWARGS).fit(Y, X, coords)
        path = tmp_path / "ckpt.npz"
        model.save(str(path))

        restored = FlashDeconv.load(str(path), **_FIT_KWARGS)
        np.testing.assert_array_equal(restored.beta_, model.beta_)
        np.testing.assert_array_equal(restored.proportions_, model.proportions_)
        np.testing.assert_array_equal(restored.gene_idx_, model.gene_idx_)
        assert restored.lambda_used_ == model.lambda_used_
        assert restored.info_["n_iterations"] == model.info_["n_iterations"]
        assert restored.summary()["fitted"]

    def test_save_unfitted_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="not been fitted"):
            FlashDeconv().save(str(tmp_path / "x.npz"))

    def test_loaded_model_warm_starts(self, synthetic_small, tmp_path):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(warm_start=True, **_FIT_KWARGS).fit(Y, X, coords)
        path = tmp_path / "ckpt.npz"
        model.save(str(path))

        restored = FlashDeconv.load(str(path), warm_start=True, **_FIT_KWARGS)
        restored.fit(Y, X, coords)
        assert restored.info_["n_iterations"] <= max(
            model.info_["n_iterations"] // 2, 2
        )


class TestLambdaPath:
    def test_path_matches_individual_fits(self, synthetic_small):
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords, _ = synthetic_small
        kwargs = dict(**_FIT_KWARGS, solver_dtype=np.float64)
        model = FlashDeconv(**kwargs)
        lambdas = np.array([0.5, 2.0, 8.0])
        path = model.fit_lambda_path(Y, X, coords, lambdas=lambdas)

        assert [r["lambda"] for r in path] == sorted(lambdas.tolist())
        assert model._fitted and model.lambda_used_ == 8.0
        np.testing.assert_array_equal(model.proportions_,
                                      path[-1]["proportions"])

        # warm-started path solutions match cold individual fits
        for r in path:
            solo = FlashDeconv(lambda_spatial=r["lambda"], **kwargs)
            solo.fit(Y, X, coords)
            np.testing.assert_allclose(
                r["proportions"], solo.proportions_, atol=1e-4
            )

    def test_warm_start_cheaper_along_path(self, synthetic_small):
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(**_FIT_KWARGS)
        path = model.fit_lambda_path(
            Y, X, coords, lambdas=np.array([1.0, 1.5, 2.0])
        )
        first = path[0]["info"]["n_iterations"]
        later = [r["info"]["n_iterations"] for r in path[1:]]
        assert max(later) <= first

    def test_default_lambda_grid(self, synthetic_small):
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(**_FIT_KWARGS)
        path = model.fit_lambda_path(Y, X, coords)
        assert len(path) == 5
        lams = [r["lambda"] for r in path]
        assert lams == sorted(lams)

    def test_empty_lambdas_raises(self, synthetic_small):
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords, _ = synthetic_small
        with pytest.raises(ValueError, match="non-empty"):
            FlashDeconv(**_FIT_KWARGS).fit_lambda_path(
                Y, X, coords, lambdas=np.array([])
            )

    def test_path_resets_stale_dominant(self, synthetic_small):
        """A previous device-output fit's dominant_ argmax must not
        survive fit_lambda_path (it would be inconsistent with the new
        proportions_ — and possibly the wrong length)."""
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(**_FIT_KWARGS)
        model.dominant_ = np.zeros(3, dtype=np.int64)  # stale stand-in
        model.fit_lambda_path(Y, X, coords, lambdas=np.array([1.0]))
        assert model.dominant_ is None
        dom = model.get_dominant_cell_type()
        np.testing.assert_array_equal(
            dom, np.argmax(model.proportions_, axis=1)
        )


class TestReviewRegressions:
    def test_one_column_coords_large_n_no_crash(self):
        """1-D coords at n >= 8192 must not crash the banded re-sort."""
        from scipy import sparse
        from flashdeconv_tpu.core.solver import bcd_solve

        rng = np.random.RandomState(0)
        n = 8192
        coords = rng.rand(n, 1) * 100  # 1-D positions (e.g. linear probe)
        # random irregular graph in input order
        from flashdeconv_tpu.utils.graph import build_knn_graph
        A = build_knn_graph(coords, k=4)
        Xs = rng.randn(4, 16)
        Ys = np.abs(rng.randn(n, 4)) @ Xs
        beta, info = bcd_solve(Ys, Xs, A, max_iter=3, coords=coords)
        assert beta.shape == (n, 4)

    def test_coo_input_fit(self, synthetic_small):
        from scipy import sparse

        Y, X, coords, _ = synthetic_small
        P = FlashDeconv(**_FIT_KWARGS).fit_transform(
            sparse.coo_matrix(Y), X, coords
        )
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-6)

    def test_sketch_device_sparse_raises(self):
        from scipy import sparse
        from flashdeconv_tpu.core.sketching import sketch_data

        Y = sparse.random(50, 100, density=0.1, format="csr")
        X = np.abs(np.random.RandomState(0).randn(3, 100))
        with pytest.raises(ValueError, match="dense"):
            sketch_data(Y, X, sketch_dim=32, backend="device")

    def test_lambda_path_respects_n_shards(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        kwargs = dict(**_FIT_KWARGS, solver_dtype=np.float64)
        lambdas = np.array([1.0, 4.0])
        p1 = FlashDeconv(**kwargs).fit_lambda_path(Y, X, coords,
                                                   lambdas=lambdas)
        p8 = FlashDeconv(n_shards=8, **kwargs).fit_lambda_path(
            Y, X, coords, lambdas=lambdas
        )
        for r1, r8 in zip(p1, p8):
            assert "n_shards" in r8["info"]
            np.testing.assert_allclose(
                r8["proportions"], r1["proportions"], atol=1e-8
            )

    def test_negative_lambda_path_raises(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        with pytest.raises(ValueError, match="non-negative"):
            FlashDeconv(**_FIT_KWARGS).fit_lambda_path(
                Y, X, coords, lambdas=np.array([-1.0, 0.5])
            )

    def test_save_load_restores_adjacency_and_names(self, synthetic_small,
                                                    tmp_path):
        Y, X, coords, _ = synthetic_small
        names = np.array([f"t{k}" for k in range(X.shape[0])])
        m = FlashDeconv(**_FIT_KWARGS).fit(Y, X, coords,
                                           cell_type_names=names)
        p = tmp_path / "c.npz"
        m.save(str(p))
        r = FlashDeconv.load(str(p), **_FIT_KWARGS)
        assert (r.adjacency_ != m.adjacency_.tocsr()).nnz == 0
        assert list(r.cell_type_names_) == list(names)

    def test_preprocess_does_not_alias_input(self):
        from scipy import sparse
        from flashdeconv_tpu.core.deconv import preprocess_data

        rng = np.random.RandomState(0)
        Y = sparse.random(40, 60, density=0.2, format="csr",
                          random_state=rng) * 10
        X = np.abs(rng.randn(3, 60))
        Y_before = Y.toarray().copy()
        Yn, _ = preprocess_data(Y, X, "log_cpm")
        assert not np.shares_memory(Yn.indices, Y.indices)
        Yn.sort_indices()           # structural op on the result...
        Yn.data[:] = -1.0           # ...and value mutation
        np.testing.assert_array_equal(Y.toarray(), Y_before)  # input intact


class TestDeviceOutputs:
    """device_outputs=True: device-side normalize + lazy beta_ fetch."""

    def test_matches_host_path(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        host = FlashDeconv(**_FIT_KWARGS, device_outputs=False).fit(
            Y, X, coords
        )
        dev = FlashDeconv(**_FIT_KWARGS, device_outputs=True).fit(
            Y, X, coords
        )
        # proportions normalized on device in solve dtype (f32): equal to
        # the host f64 normalize to f32 resolution
        np.testing.assert_allclose(
            dev.proportions_, host.proportions_, atol=1e-6
        )
        assert dev.proportions_.dtype == np.float64
        np.testing.assert_allclose(
            dev.proportions_.sum(axis=1), 1.0, atol=1e-5
        )

    def test_beta_lazy_fetch(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        dev = FlashDeconv(**_FIT_KWARGS, device_outputs=True).fit(
            Y, X, coords
        )
        assert dev._beta_host is None and dev._beta_dev is not None
        host = FlashDeconv(**_FIT_KWARGS, device_outputs=False).fit(
            Y, X, coords
        )
        b = dev.beta_  # first access fetches + converts + caches
        assert dev._beta_host is not None and dev._beta_dev is None
        assert b.dtype == np.float64
        np.testing.assert_allclose(b, host.beta_, atol=1e-6)
        # warm-start and save/load consume beta_ through the property
        assert dev.get_abundances() is not None

    def test_save_load_through_device_path(self, synthetic_small, tmp_path):
        Y, X, coords, _ = synthetic_small
        m = FlashDeconv(**_FIT_KWARGS, device_outputs=True).fit(Y, X, coords)
        p = tmp_path / "dev.npz"
        m.save(str(p))
        r = FlashDeconv.load(str(p), **_FIT_KWARGS)
        np.testing.assert_array_equal(r.proportions_, m.proportions_)
        np.testing.assert_array_equal(r.beta_, m.beta_)

    def test_device_outputs_sharded_single_process(self, synthetic_small):
        """Explicit device_outputs=True is honored on a (single-process)
        sharded fit: proportions match the host-path sharded fit and
        beta_ stays device-resident until touched."""
        Y, X, coords, _ = synthetic_small
        host = FlashDeconv(**_FIT_KWARGS, n_shards=4,
                           device_outputs=False).fit(Y, X, coords)
        dev = FlashDeconv(**_FIT_KWARGS, n_shards=4,
                          device_outputs=True).fit(Y, X, coords)
        assert dev._beta_host is None and dev._beta_dev is not None
        np.testing.assert_allclose(
            dev.proportions_, host.proportions_, atol=1e-6
        )
        np.testing.assert_allclose(dev.beta_, host.beta_, atol=1e-6)


class TestWirePayloadControls:
    """fetch_dtype / outputs: the remote-fetch payload controls (round 4).

    Both only act on the device-outputs path; device_outputs=True forces
    that path on CPU so the contract is testable without hardware.
    """

    def test_fetch_dtype_validation(self):
        import pytest

        with pytest.raises(ValueError, match="fetch_dtype"):
            FlashDeconv(fetch_dtype="float8")
        with pytest.raises(ValueError, match="outputs"):
            FlashDeconv(outputs=())
        with pytest.raises(ValueError, match="outputs"):
            FlashDeconv(outputs=("beta",))
        assert FlashDeconv(fetch_dtype=np.float16).fetch_dtype == "float16"

    def test_fetch_dtype_float16_quantizes_only(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        exact = FlashDeconv(**_FIT_KWARGS, device_outputs=True).fit(
            Y, X, coords
        )
        f16 = FlashDeconv(
            **_FIT_KWARGS, device_outputs=True, fetch_dtype="float16"
        ).fit(Y, X, coords)
        assert f16.proportions_.dtype == np.float64
        # f16 quantization of values in [0, 1]: <= 2^-11 absolute
        np.testing.assert_allclose(
            f16.proportions_, exact.proportions_, atol=5e-4
        )
        np.testing.assert_allclose(
            f16.proportions_.sum(axis=1), 1.0, atol=5e-3
        )
        # identical dominant type despite quantization (generic data)
        np.testing.assert_array_equal(
            f16.get_dominant_cell_type(), exact.get_dominant_cell_type()
        )

    def test_outputs_dominant_only(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        full = FlashDeconv(**_FIT_KWARGS, device_outputs=True).fit(
            Y, X, coords
        )
        dom = FlashDeconv(
            **_FIT_KWARGS, device_outputs=True, outputs=("dominant",)
        ).fit(Y, X, coords)
        # only the uint8 argmax crossed the wire; proportions stay device
        assert dom.dominant_ is not None
        assert dom._props_host is None and dom._props_dev is not None
        np.testing.assert_array_equal(
            dom.get_dominant_cell_type(), full.get_dominant_cell_type()
        )
        # lazy access still yields full proportions
        np.testing.assert_allclose(
            dom.proportions_, full.proportions_, atol=1e-6
        )
        assert dom._props_dev is None  # fetched + cached

    def test_outputs_both(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        m = FlashDeconv(
            **_FIT_KWARGS, device_outputs=True,
            outputs=("proportions", "dominant"),
        ).fit(Y, X, coords)
        assert m.dominant_ is not None and m._props_host is not None
        np.testing.assert_array_equal(
            m.dominant_, np.argmax(m.proportions_, axis=1)
        )

    def test_host_path_ignores_payload_controls(self, synthetic_small):
        """On the host (reference-exact) path the controls are inert:
        proportions are the full host f64 normalize."""
        Y, X, coords, _ = synthetic_small
        m = FlashDeconv(
            **_FIT_KWARGS, device_outputs=False, fetch_dtype="float16",
            outputs=("dominant",),
        ).fit(Y, X, coords)
        assert m.dominant_ is None
        assert m._props_host is not None
        assert m.proportions_.dtype == np.float64


class TestSensitivityBands:
    """Regression pins for the reference's documented robustness findings
    (reference ``docs/stereo_seq_guide.md:169-174``), reproduced on the
    silver-standard protocol by ``benchmarks/sensitivity.py``: log_cpm vs
    pearson preprocessing must stay result-correlated (the reference
    reports r ~ 0.72-0.94 on real Stereo-seq; the cleaner synthetic
    protocol measures ~0.97), and k_neighbors 4-12 must be ~inert."""

    @pytest.fixture(scope="class")
    def sens_row(self):
        import os
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(__file__), "..", "benchmarks"),
        )
        import sensitivity

        return sensitivity.run_one("regional_deep", seed=0, n_spots=300)

    def test_preprocess_result_correlation_band(self, sens_row):
        # >= the reference band's lower edge; both modes must also stay
        # accurate in their own right.
        assert sens_row["preproc_result_corr"] >= 0.72
        assert sens_row["accuracy_log_cpm"] > 0.9
        assert sens_row["accuracy_pearson"] > 0.9

    def test_k_neighbors_insensitivity(self, sens_row):
        for k, corr in sens_row["k_result_corr_vs_k6"].items():
            assert corr >= 0.9, (k, corr)
        accs = sens_row["k_accuracy"]
        assert max(accs.values()) - min(accs.values()) < 0.05


def test_reserve_host_arena_async():
    """The background arena reservation returns a waitable handle and the
    fault pass completes; repeated calls for already-reserved sizes return
    completed handles immediately."""
    from flashdeconv_tpu.utils import hostmem

    h = hostmem.reserve_host_arena_async(0.05)
    assert h.wait(timeout=60) is True
    assert h.done
    h2 = hostmem.reserve_host_arena_async(0.05)  # idempotent fast path
    assert h2.done and h2.wait() is True


def test_reserve_host_arena_inflight_coalescing(monkeypatch):
    """While a background fault is still running, a covered async re-request
    must hand back the SAME handle (not a fresh completed one — that would
    let the caller allocate concurrently with the held arena), and the
    synchronous variant must join the flight before reporting success."""
    import threading

    from flashdeconv_tpu.utils import hostmem

    release = threading.Event()
    started = threading.Event()
    real = hostmem._fault_and_release

    def gated(arena_box):
        started.set()
        release.wait(30)
        real(arena_box)

    monkeypatch.setattr(hostmem, "_fault_and_release", gated)
    monkeypatch.setattr(hostmem, "_reserved_bytes", 0)
    monkeypatch.setattr(hostmem, "_inflight", None)
    try:
        h = hostmem.reserve_host_arena_async(0.01)
        if h._thread is None:  # non-glibc platform: nothing to coalesce
            return
        assert started.wait(10)
        assert not h.done
        # Covered re-request while in flight: same handle, still pending.
        h2 = hostmem.reserve_host_arena_async(0.01)
        assert h2 is h
        assert not h2.done
        # Sync variant joins the running flight instead of returning early
        # on the (already-advanced) _reserved_bytes bookkeeping.
        joined = {}
        t = threading.Thread(
            target=lambda: joined.setdefault(
                "ok", hostmem.reserve_host_arena(0.01)
            )
        )
        t.start()
        t.join(0.3)
        assert t.is_alive(), "sync reserve returned before the flight ended"
        release.set()
        t.join(30)
        assert joined.get("ok") is True
        assert h.wait(30) is True and h.done
    finally:
        release.set()
