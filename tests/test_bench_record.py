"""Unit tests for bench.py's record assembly, gating, and emit machinery --
the deadline-survival path the driver capture depends on (round-4 VERDICT
#1). Pure CPU: no jax, no chip; exercises _Record/_Phases directly."""

from __future__ import annotations

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeFit:
    spread = 0.01


def test_record_emits_parseable_json_when_empty():
    bench = _load_bench()
    rec = bench._Record()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rec.emit()
    rec2 = json.loads(buf.getvalue().strip())
    assert rec2["vs_baseline"] == 0.0
    assert rec2["vs_baseline_turbo_modes"] == 0.0
    assert "metric" in rec2 and "unit" in rec2


def test_geomean_uses_only_gated_rows():
    bench = _load_bench()
    rec = bench._Record()
    fit = _FakeFit()
    # Two bilateral rows: the faster one fails its gate and must NOT carry.
    d4k5 = (4, 5, None)
    d8s6 = (8, 6, 6.0)
    rec.turbo[("render",) + d4k5] = (6000.0, fit)
    rec.turbo[("render",) + d8s6] = (9000.0, fit)
    rec.gates[d4k5] = (45.0, 44.0)
    rec.gate_ok[d4k5] = True
    rec.gates[d8s6] = (41.0, 37.0)
    rec.gate_ok[d8s6] = False
    nlm_key = (6, 2, True, False)
    rec.nlm_turbo[nlm_key] = (1000.0, fit)
    rec.nlm_gates[nlm_key] = (41.0, 40.5)
    rec.nlm_gate_ok[nlm_key] = True
    buf = io.StringIO()
    with redirect_stdout(buf):
        rec.emit()
    out = json.loads(buf.getvalue().strip())
    # geomean = sqrt(6000/5000 * 1000/500), NOT using the ungated 9000.
    # The record rounds to 4 decimals.
    assert abs(out["vs_baseline_turbo_modes"] - (1.2 * 2.0) ** 0.5) < 1e-4
    assert out["turbo_d8s6_gate_ok"] is False
    assert out["turbo_d8s6_4k_mpix_s"] == 9000.0  # published, just ungated
    assert out["turbo_d4k5_gate_ok"] is True


def test_exact_check_failures_zero_all_headlines():
    bench = _load_bench()
    rec = bench._Record()
    fit = _FakeFit()
    key = (4, 5, None)
    rec.turbo[("render",) + key] = (6000.0, fit)
    rec.gates[key] = (45.0, 44.0)
    rec.gate_ok[key] = True
    nlm_key = (7, 2, False, False)
    rec.nlm_turbo[nlm_key] = (800.0, fit)
    rec.nlm_gates[nlm_key] = (42.0, 41.0)
    rec.nlm_gate_ok[nlm_key] = True
    rec.failures.append("bilateral:12.0dB")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rec.emit()
    out = json.loads(buf.getvalue().strip())
    assert out["vs_baseline"] == 0.0
    assert out["vs_baseline_turbo_modes"] == 0.0
    assert out["exact_check_failures"] == ["bilateral:12.0dB"]


def test_nlm_headline_row_zeroed_without_gate():
    bench = _load_bench()
    rec = bench._Record()
    fit = _FakeFit()
    key = (7, 2, False, False)  # the historical headline row
    rec.nlm_turbo[key] = (800.0, fit)  # gate never measured
    buf = io.StringIO()
    with redirect_stdout(buf):
        rec.emit()
    out = json.loads(buf.getvalue().strip())
    assert out["nlm_turbo_4k_mpix_s"] == 0.0


def test_phases_skip_on_deadline_and_checkpoint(monkeypatch):
    bench = _load_bench()
    rec = bench._Record()
    phases = bench._Phases(rec)
    calls = []
    monkeypatch.setattr(bench, "_remaining", lambda: 10.0)  # below any est
    buf = io.StringIO()
    with redirect_stdout(buf):
        ran = phases.run("late_phase", lambda: calls.append(1), est_s=60)
    assert not ran and not calls
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1  # the checkpoint record still printed
    out = json.loads(lines[0])
    assert any("skipped (deadline" in e for e in out["phase_errors"])
    assert out["degraded"] is True


def test_phases_fence_failure_and_reprobe(monkeypatch):
    bench = _load_bench()
    rec = bench._Record()
    phases = bench._Phases(rec)
    monkeypatch.setattr(bench, "_remaining", lambda: 1000.0)
    monkeypatch.setattr(
        bench, "_probe_backend", lambda **kw: (False, 1, "down")
    )

    def boom():
        raise RuntimeError("kernel exploded")

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert not phases.run("p1", boom, est_s=10)
        assert phases.dead  # re-probe said the backend is gone
        assert not phases.run("p2", lambda: None, est_s=10)
    out = json.loads(buf.getvalue().splitlines()[-1])
    errs = " | ".join(out["phase_errors"])
    assert "kernel exploded" in errs and "p2: skipped (backend down)" in errs


def test_tag_naming():
    bench = _load_bench()
    assert bench._Record._tag(2, 6, None) == "turbo_d2"
    assert bench._Record._tag(2, 5, None) == "turbo_d2k5"
    assert bench._Record._tag(8, 6, 6.0) == "turbo_d8s6"
