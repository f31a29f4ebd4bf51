"""Round-5 tests: screening-pipeline backend-death handling (VERDICT r4
item 4 — BENCH_r04 attempt 1 died with FAILED_PRECONDITION in the drain
loop) and the multi-dispatcher device path (item 5 — one dispatcher
serializes per-chunk transfer RPCs over the tunnel).
"""
import csv
import threading
import time

import numpy as np
import pytest

from bbbp_tpu.pipelines.screen import (ScreenBackendError, ScreeningModel,
                                       screen)


@pytest.fixture(scope="module")
def tiny_model():
    labels = np.array([1, 0, 1, 0] * 8, np.float32)
    return ScreeningModel.train(["CCO", "CCN", "c1ccccc1", "CCS"] * 8,
                                labels, pca_dim=4, n_estimators=10)


def _stream(n):
    mols = ["CCO", "CCN", "c1ccccc1", "CCS", "CC(C)O", "CCCl"]
    return iter((mols[i % len(mols)], f"M{i:04d}") for i in range(n))


class _BoomOnFetch:
    """A fake device future whose materialization raises like a dead axon
    worker (jax surfaces XlaRuntimeError("FAILED_PRECONDITION: ...") from
    np.asarray on the buffer)."""

    def __array__(self, dtype=None, copy=None):
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error (injected)")


class TestDrainBackendDeath:
    def test_backend_death_raises_attributed_error_no_hang(
            self, tiny_model, monkeypatch):
        """Kill the fetch of chunk 1 only: screen() must raise
        ScreenBackendError carrying chunk_index=1 and leave no blocked
        pipeline threads behind."""
        import bbbp_tpu.pipelines.screen as scr

        calls = []

        def fake_factory(model, mesh=None):
            def run(arr):
                seq = len(calls)
                calls.append(seq)
                if seq == 1:
                    return _BoomOnFetch()
                return np.zeros(arr.shape[0], np.float32)
            return run

        monkeypatch.setattr(scr, "_make_device_fn", fake_factory)
        monkeypatch.setattr(scr, "_make_packed_device_fn", fake_factory)
        before = threading.active_count()
        # dispatch_workers=1 -> device calls happen in sequence order, so
        # the injected death maps deterministically to chunk 1
        with pytest.raises(ScreenBackendError) as ei:
            screen(tiny_model, _stream(48), out_csv=None, chunk_size=8,
                   dispatch_workers=1)
        assert ei.value.chunk_index == 1
        assert "FAILED_PRECONDITION" in str(ei.value)
        # every pipeline thread must unwind (drain_all_ends unblocked them)
        deadline = time.time() + 10
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_backend_death_with_concurrent_dispatchers_no_hang(
            self, tiny_model, monkeypatch):
        """All fetches die: with several dispatchers in flight the error
        still surfaces as ScreenBackendError and nothing deadlocks."""
        import bbbp_tpu.pipelines.screen as scr

        def fake_factory(model, mesh=None):
            return lambda arr: _BoomOnFetch()

        monkeypatch.setattr(scr, "_make_device_fn", fake_factory)
        monkeypatch.setattr(scr, "_make_packed_device_fn", fake_factory)
        before = threading.active_count()
        with pytest.raises(ScreenBackendError):
            screen(tiny_model, _stream(64), out_csv=None, chunk_size=8,
                   dispatch_workers=3)
        deadline = time.time() + 10
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before


class TestMultiDispatcher:
    def test_csv_order_preserved_with_concurrent_dispatchers(
            self, tiny_model, tmp_path):
        """Chunks dispatched by 3 concurrent threads must still write the
        CSV in input order (sequence-number reordering in the drain)."""
        out = tmp_path / "screen.csv"
        n = 100
        stats = screen(tiny_model, _stream(n), out_csv=str(out),
                       chunk_size=16, dispatch_workers=3)
        assert stats.n_molecules == n
        with open(out) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["ID", "SMILES", "Prediction", "Probability"]
        ids = [r[0] for r in rows[1:]]
        assert ids == [f"M{i:04d}" for i in range(n)]

    def test_dispatcher_counts_match_single_dispatcher_results(
            self, tiny_model, tmp_path):
        """Same molecules, 1 vs 3 dispatchers: identical probabilities row
        by row (the device fn is deterministic; only scheduling differs)."""
        out1, out3 = tmp_path / "d1.csv", tmp_path / "d3.csv"
        screen(tiny_model, _stream(60), out_csv=str(out1), chunk_size=16,
               dispatch_workers=1)
        screen(tiny_model, _stream(60), out_csv=str(out3), chunk_size=16,
               dispatch_workers=3)
        with open(out1) as f1, open(out3) as f3:
            assert f1.read() == f3.read()
