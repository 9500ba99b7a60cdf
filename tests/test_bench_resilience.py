"""bench.py resilience contract (round-3 VERDICT #1): the driver's record
must survive a wedged backend. One JSON line is ALWAYS emitted -- with an
"error" field instead of a traceback when the chip never comes up -- and a
mid-run phase failure degrades the record instead of blanking it.

bench.py is loaded by path (it lives at the repo root, not in the package)
and never touches jax at import time, so these tests stay CPU-only and fast.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench_under_test", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _run_main_and_parse(capsys):
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1, f"bench must print exactly ONE line, got {lines}"
    return json.loads(lines[0])


def test_emits_error_json_when_backend_never_comes_up(capsys, monkeypatch):
    monkeypatch.setattr(
        bench, "_probe_backend", lambda **kw: (False, 7, "probe timeout")
    )
    out = _run_main_and_parse(capsys)
    assert out["vs_baseline"] == 0.0
    assert out["value"] == 0.0
    assert "probe timeout" in out["error"]
    assert out["backend_probe_attempts"] == 7
    assert out["unit"] == "x-target"


def test_emits_error_json_when_measurement_explodes(capsys, monkeypatch):
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: (True, 1, ""))

    def boom(out):
        raise RuntimeError("compile service wedged")

    monkeypatch.setattr(bench, "_measure", boom)
    out = _run_main_and_parse(capsys)
    assert out["vs_baseline"] == 0.0
    assert "compile service wedged" in out["error"]
    assert out["degraded"] is True


def test_phase_failure_degrades_but_continues_when_backend_alive(monkeypatch):
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: (True, 1, ""))
    out = {}
    phases = bench._Phases(out)
    ran = []
    assert not phases.run("p1", lambda: (_ for _ in ()).throw(ValueError("x")))
    assert phases.run("p2", lambda: ran.append("p2"))
    assert ran == ["p2"]
    assert out["phase_errors"] == ["p1: ValueError: x"]
    assert not phases.dead


def test_phase_failure_stops_launches_when_backend_dead(monkeypatch):
    monkeypatch.setattr(
        bench, "_probe_backend", lambda **kw: (False, 2, "down")
    )
    out = {}
    phases = bench._Phases(out)
    ran = []
    assert not phases.run("p1", lambda: (_ for _ in ()).throw(OSError("rpc")))
    assert phases.dead
    assert not phases.run("p2", lambda: ran.append("p2"))
    assert ran == []
    assert out["phase_errors"] == [
        "p1: OSError: rpc",
        "p2: skipped (backend down)",
    ]


def test_probe_backend_succeeds_on_trivial_probe(monkeypatch):
    monkeypatch.setattr(bench, "_PROBE_SRC", "print('ok')")
    ok, attempts, err = bench._probe_backend(window_s=30.0)
    assert ok and attempts == 1 and err == ""


def test_probe_backend_bounded_retry_on_failure(monkeypatch):
    monkeypatch.setattr(
        bench, "_PROBE_SRC", "import sys; sys.exit(1)"
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, attempts, err = bench._probe_backend(window_s=3.0)
    assert not ok and attempts >= 1


@pytest.mark.skipif(sys.platform != "linux", reason="timeout semantics")
def test_probe_backend_reaps_a_hung_probe(monkeypatch):
    """A wedged data plane hangs forever in-process; the subprocess probe
    must bound it (CLAUDE.md wedge guidance)."""
    monkeypatch.setattr(
        bench, "_PROBE_SRC", "import time; time.sleep(600)"
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    ok, attempts, err = bench._probe_backend(
        window_s=4.0, attempt_timeout=2.0
    )
    assert not ok
    assert "timeout" in err
