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


class TestQueueSupervisor:
    """The round-5 queue supervisor is the fix for round 4's silent queue
    death — test its ledger/retry/skip logic with fake stages (no TPU)."""

    def _mk(self, tmp_path, monkeypatch, stages_text):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "qsup", "/root/repo/scripts/queue_supervisor.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(mod, "STAGES_TSV", str(tmp_path / "stages.tsv"))
        monkeypatch.setattr(mod, "LEDGER", str(tmp_path / "ledger.jsonl"))
        monkeypatch.setattr(mod, "LOG_DIR", str(tmp_path / "logs"))
        monkeypatch.setattr(mod, "HEARTBEAT", str(tmp_path / "logs/hb.txt"))
        monkeypatch.setattr(mod, "RECOVERY_WAIT_S", 0)
        monkeypatch.setattr(mod, "tpu_gate", lambda deadline_s: True)
        import os
        os.makedirs(tmp_path / "logs", exist_ok=True)
        (tmp_path / "stages.tsv").write_text(stages_text)
        return mod

    def _events(self, mod):
        import json
        with open(mod.LEDGER) as f:
            return [json.loads(ln) for ln in f]

    def test_done_and_failed_stages_recorded(self, tmp_path, monkeypatch):
        mod = self._mk(tmp_path, monkeypatch,
                       "ok\t60\ttrue\nbad\t60\texit 7\nok2\t60\techo hi\n")
        for name, t, cmd in mod.read_stages():
            mod.run_stage(name, t, cmd)
        ev = self._events(mod)
        assert [e["event"] for e in ev if e["stage"] == "ok"] == \
            ["started", "done"]
        bad = [e for e in ev if e["stage"] == "bad"]
        assert [e["event"] for e in bad] == ["started", "retry", "started",
                                             "retry", "started", "failed"]
        assert all(e.get("rc") == 7 for e in bad if e["event"] != "started")
        # the queue moved past the failure: ok2 still landed
        assert any(e["stage"] == "ok2" and e["event"] == "done" for e in ev)

    def test_timeout_kills_and_records(self, tmp_path, monkeypatch):
        mod = self._mk(tmp_path, monkeypatch, "slow\t1\tsleep 30\n")
        monkeypatch.setattr(mod, "MAX_ATTEMPTS", 1)
        import time as _t
        t0 = _t.time()
        ok = mod.run_stage("slow", 1, "sleep 30")
        assert not ok and _t.time() - t0 < 15
        ev = self._events(mod)
        assert ev[-1]["event"] == "failed"
        assert "timeout" in ev[-1]["reason"]

    def test_restart_skips_done_stages(self, tmp_path, monkeypatch):
        mod = self._mk(tmp_path, monkeypatch, "a\t60\ttrue\n")
        mod.run_stage("a", 60, "true")
        assert mod.ledger_done_stages() == {"a"}
        pending = [s for s in mod.read_stages()
                   if s[0] not in mod.ledger_done_stages()]
        assert pending == []

    def test_stalled_stage_killed_and_recorded(self, tmp_path, monkeypatch):
        """A stage whose log stops advancing (wedged RPC after a worker
        restart) must be killed at STALL_KILL_S and recorded, well before
        its wall-clock timeout."""
        mod = self._mk(tmp_path, monkeypatch, "wedge\t600\tsleep 120\n")
        monkeypatch.setattr(mod, "MAX_ATTEMPTS", 1)
        monkeypatch.setattr(mod, "STALL_KILL_S", 2)
        import time as _t
        t0 = _t.time()
        ok = mod.run_stage("wedge", 600, "echo start && sleep 120")
        assert not ok and _t.time() - t0 < 90
        ev = self._events(mod)
        assert ev[-1]["event"] == "failed"
        assert "stalled" in ev[-1]["reason"]

    def test_first_output_wedge_killed_early(self, tmp_path, monkeypatch):
        """A stage that never produces output (first op wedged right after
        a passing gate — observed live) dies at FIRST_OUTPUT_KILL_S, not at
        the much larger stall/timeout thresholds."""
        mod = self._mk(tmp_path, monkeypatch, "w\t600\tsleep 120\n")
        monkeypatch.setattr(mod, "MAX_ATTEMPTS", 1)
        monkeypatch.setattr(mod, "FIRST_OUTPUT_KILL_S", 2)
        import time as _t
        t0 = _t.time()
        ok = mod.run_stage("w", 600, "sleep 120")
        assert not ok and _t.time() - t0 < 90
        ev = self._events(mod)
        assert ev[-1]["event"] == "failed"
        assert "first op wedged" in ev[-1]["reason"]

    def test_first_output_killer_spares_verbose_stage(self, tmp_path,
                                                      monkeypatch):
        """A stage that printed a real header (>200 bytes) is NOT killed by
        the first-output rule even while silent afterwards."""
        mod = self._mk(tmp_path, monkeypatch, "v\t600\tx\n")
        monkeypatch.setattr(mod, "MAX_ATTEMPTS", 1)
        monkeypatch.setattr(mod, "FIRST_OUTPUT_KILL_S", 2)
        cmd = "python -c \"print('h'*300, flush=True); import time; time.sleep(40)\""
        ok = mod.run_stage("v", 600, cmd)
        assert ok

    def test_main_loop_moves_past_a_terminally_failed_stage(self, tmp_path,
                                                            monkeypatch):
        """A stage that exhausts retries must not be re-picked by main() —
        otherwise a deterministic failure starves the queue tail forever
        (bug found live in round 5: fvprobe crashing the worker would have
        blocked retune/seed44/strict5/mlm)."""
        import threading
        mod = self._mk(tmp_path, monkeypatch,
                       "bad\t60\texit 7\nok\t60\techo hi\n")
        monkeypatch.setattr(mod, "MAX_ATTEMPTS", 1)
        t = threading.Thread(target=mod.main, daemon=True)
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "main() re-picked the failed stage forever"
        ev = self._events(mod)
        assert any(e["stage"] == "bad" and e["event"] == "failed" for e in ev)
        assert any(e["stage"] == "ok" and e["event"] == "done" for e in ev)
        assert ev[-1]["event"] == "all_done"
        # exactly one attempt at the failed stage: no starvation loop
        assert sum(1 for e in ev
                   if e["stage"] == "bad" and e["event"] == "started") == 1


class TestTreeStageCheckpoint:
    def test_interrupted_tree_stage_resumes_bit_identical(self, tmp_path,
                                                          monkeypatch):
        """Kill the tree stage mid-fold (the round-5 wedge pattern), rerun,
        and require bit-identical OOF columns vs an uninterrupted run."""
        import numpy as np
        from tests.test_round3 import _tiny_processed
        from bbbp_tpu.train import regression as R

        common = dict(
            protocol="honest", n_folds=3, epochs=2, nn_seeds=1,
            graph_leg=False, bert_leg=False, tree_seeds=1, snapshot_from=None,
            rf_trees=8, gbdt_trees=8, cat_trees=8, image_size=8,
            split_repeats=2)
        d = _tiny_processed()
        ref = R.run_regression(
            R.RegressionTrainConfig(out_dir=str(tmp_path / "ref"), **common),
            data=d, verbose=False)

        # interrupted run: blow up on the 3rd tree fold cell
        calls = {"n": 0}
        orig = R.GBDTRegressor.fit

        def dying_fit(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] > 4:
                raise RuntimeError("injected worker wedge")
            return orig(self, *a, **kw)

        out = str(tmp_path / "resume")
        monkeypatch.setattr(R.GBDTRegressor, "fit", dying_fit)
        import pytest as _pt
        with _pt.raises(RuntimeError, match="injected"):
            R.run_regression(
                R.RegressionTrainConfig(out_dir=out, **common),
                data=d, verbose=False)
        monkeypatch.setattr(R.GBDTRegressor, "fit", orig)
        import os
        assert os.path.exists(os.path.join(out, "tree_ckpt.pkl"))

        res = R.run_regression(
            R.RegressionTrainConfig(out_dir=out, **common),
            data=d, verbose=True)
        for m in ("rf", "gbdt", "cat", "knn", "ridge", "tknn"):
            np.testing.assert_array_equal(res.oof[m], ref.oof[m], err_msg=m)
        # ckpt removed after the stage completes
        assert not os.path.exists(os.path.join(out, "tree_ckpt.pkl"))

    def test_deep_leg_restored_from_checkpoint(self, tmp_path, monkeypatch):
        """A retry after a tree-stage wedge must NOT retrain the deep legs:
        the graph column is restored from the ckpt (poisoned MPNN proves the
        training path is skipped) and matches the uninterrupted run."""
        import os
        import numpy as np
        from tests.test_round3 import _tiny_processed
        from bbbp_tpu.train import regression as R
        import bbbp_tpu.models.gnn as gnn

        common = dict(
            protocol="honest", n_folds=3, epochs=2, nn_seeds=1,
            graph_leg=True, graph_epochs=2, graph_hidden=8, graph_layers=1,
            graph_seeds=1, max_atoms=16,
            bert_leg=False, tree_seeds=1, snapshot_from=None,
            rf_trees=8, gbdt_trees=8, cat_trees=8, image_size=8)
        d = _tiny_processed()
        ref = R.run_regression(
            R.RegressionTrainConfig(out_dir=str(tmp_path / "ref"), **common),
            data=d, verbose=False)

        calls = {"n": 0}
        orig = R.GBDTRegressor.fit

        def dying_fit(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] > 2:
                raise RuntimeError("injected worker wedge")
            return orig(self, *a, **kw)

        out = str(tmp_path / "resume")
        monkeypatch.setattr(R.GBDTRegressor, "fit", dying_fit)
        import pytest as _pt
        with _pt.raises(RuntimeError, match="injected"):
            R.run_regression(
                R.RegressionTrainConfig(out_dir=out, **common),
                data=d, verbose=False)
        monkeypatch.setattr(R.GBDTRegressor, "fit", orig)
        assert os.path.exists(os.path.join(out, "tree_ckpt.pkl"))

        def poisoned_init(self, *a, **kw):  # noqa: ARG001
            raise AssertionError("graph leg retrained despite ckpt")

        monkeypatch.setattr(gnn.MPNNRegressor, "__init__", poisoned_init)
        res = R.run_regression(
            R.RegressionTrainConfig(out_dir=out, **common),
            data=d, verbose=False)
        np.testing.assert_array_equal(res.oof["graph"], ref.oof["graph"])
        np.testing.assert_array_equal(res.oof["rf"], ref.oof["rf"])

    def test_stale_checkpoint_key_ignored(self, tmp_path):
        """A ckpt written by a DIFFERENT config must be ignored, not merged."""
        import os
        import pickle
        import numpy as np
        from tests.test_round3 import _tiny_processed
        from bbbp_tpu.train import regression as R

        common = dict(
            protocol="honest", n_folds=3, epochs=2, nn_seeds=1,
            graph_leg=False, bert_leg=False, tree_seeds=1, snapshot_from=None,
            rf_trees=8, gbdt_trees=8, cat_trees=8, image_size=8)
        d = _tiny_processed()
        out = str(tmp_path / "run")
        os.makedirs(out)
        with open(os.path.join(out, "tree_ckpt.pkl"), "wb") as f:
            pickle.dump({"key": "bogus", "state": {
                "cells": {(0, 0)}, "oof_r": {}, "rep_acc": {},
                "tree_seed_acc": {}, "reps_done": set()}}, f)
        ref = R.run_regression(
            R.RegressionTrainConfig(out_dir=str(tmp_path / "ref"), **common),
            data=d, verbose=False)
        res = R.run_regression(
            R.RegressionTrainConfig(out_dir=out, **common),
            data=d, verbose=False)
        np.testing.assert_array_equal(res.oof["rf"], ref.oof["rf"])
