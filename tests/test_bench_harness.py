"""Transient-tolerance tests for the bench.py harness (VERDICT round-3 item 1).

The round-3 driver receipt died on a single transient tunnel error in the very
first host fetch (rc=1, no JSON at all). These tests inject failures at that
exact point (and at whole-measurement scope) and assert the harness still
emits its one JSON line with the measured figures it could obtain.
"""
import io
import json
import sys
import contextlib

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


class Flaky:
    """Callable that raises ``n_failures`` times, then delegates."""

    def __init__(self, n_failures, fn):
        self.left = n_failures
        self.fn = fn
        self.calls = 0

    def __call__(self, *a, **kw):
        self.calls += 1
        if self.left > 0:
            self.left -= 1
            raise RuntimeError("FAILED_PRECONDITION: injected tunnel error")
        return self.fn(*a, **kw)


def test_retry_recovers_and_records():
    errors = {}
    flaky = Flaky(2, lambda: 42)
    out = bench._retry("stage", lambda: flaky(), errors, attempts=3,
                       backoff_sec=0.0)
    assert out == 42
    assert flaky.calls == 3
    assert "stage_recovered" in errors and "injected" in errors["stage_recovered"]


def test_retry_exhaustion_raises_and_records():
    errors = {}
    flaky = Flaky(5, lambda: 42)
    with pytest.raises(RuntimeError):
        bench._retry("stage", lambda: flaky(), errors, attempts=3,
                     backoff_sec=0.0)
    assert "stage" in errors and "3 attempts failed" in errors["stage"]


def _fake_data():
    # shapes mimic the real ones closely enough for the slicing downstream
    n = np.full((bench.BATCH, 8), 0.1, np.float32)
    chois_ri = np.zeros((2, bench.BATCH, 4, 4), np.float32)
    return n, chois_ri


def test_tpu_throughput_survives_first_fetch_failure(monkeypatch):
    """The exact round-3 failure mode: _make_data's first host fetch dies."""
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # skip backoff
    monkeypatch.setattr(bench, "_make_data", Flaky(1, lambda *a: _fake_data()))
    monkeypatch.setattr(bench, "_time_solver",
                        lambda solve, *a, **kw: (np.full(4, 0.1), 0.01))
    monkeypatch.setattr(bench, "_time_solver_sustained",
                        lambda solve, *a, **kw: 0.01)
    monkeypatch.setattr(
        bench, "_solver",
        lambda *a, **kw: lambda *args: (np.full(4, 0.1), np.full(4, 3.0)))
    perf = bench.tpu_throughput()
    assert perf["solves_per_sec"] > 0
    assert "make_data_recovered" in perf["errors"]


def test_main_emits_json_when_inprocess_dies_and_subprocess_recovers(
        monkeypatch):
    def boom(errors=None):
        raise RuntimeError("UNAVAILABLE: injected whole-measurement failure")

    fake_perf = {"solves_per_sec": 123456.0, "sustained_solves_per_sec": 1.5e5,
                 "parity_solves_per_sec": 12000.0, "batch": bench.BATCH,
                 "errors": {"note": "from fallback subprocess"}}
    monkeypatch.setattr(bench, "tpu_throughput", boom)
    monkeypatch.setattr(bench, "_subprocess_tpu", lambda errors: fake_perf)
    monkeypatch.setattr(bench, "cpu_parity",
                        lambda: {"fused_parity_dev": 8.4e-7})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["value"] == 123456.0
    assert out["parity_solves_per_sec"] == 12000.0
    assert out["fused_parity_dev_f64"] == 8.4e-7
    assert "tpu_inprocess" in out["errors"]
    assert out["errors"]["note"] == "from fallback subprocess"


def test_main_emits_json_even_when_everything_fails(monkeypatch):
    def boom(errors=None):
        raise RuntimeError("UNAVAILABLE: injected")

    monkeypatch.setattr(bench, "tpu_throughput", boom)
    monkeypatch.setattr(bench, "_subprocess_tpu", lambda errors: None)
    monkeypatch.setattr(bench, "cpu_parity",
                        lambda: {"max_deviation_vs_oracle": None,
                                 "parity_error": "skipped"})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    out = json.loads(buf.getvalue().strip())
    assert out["metric"] == "2q_process_tomography_mle_throughput"
    assert out["value"] is None
    assert "tpu_inprocess" in out["errors"]
