"""bench.py resilience contract (round-3 VERDICT #1, round-4 VERDICT #1):
the driver's record must survive a wedged backend AND an external timeout.
The child (`main()`) prints a full JSON checkpoint line after every phase --
the driver parses the TAIL line, so the last one wins -- with an "error"
field instead of a traceback when the chip never comes up; a mid-run phase
failure degrades the record instead of blanking it. The parent supervisor
(`_supervisor_main`) bounds a GIL-holding child wedge with SIGKILL at the
wall-clock deadline and re-prints the last complete record.

bench.py is loaded by path (it lives at the repo root, not in the package)
and never touches jax at import time, so these tests stay CPU-only and fast.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

_BENCH_PATH = Path(__file__).resolve().parent.parent / "bench.py"
_spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _run_main_and_parse(capsys):
    """Run the measurement child in-process; parse the TAIL checkpoint."""
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert lines, "bench child must print at least the initial checkpoint"
    for line in lines:  # every checkpoint must be independently parseable
        json.loads(line)
    return json.loads(lines[-1])


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

    def boom(rec, phases):
        raise RuntimeError("compile service wedged")

    monkeypatch.setattr(bench, "_measure", boom)
    out = _run_main_and_parse(capsys)
    assert out["vs_baseline"] == 0.0
    assert "compile service wedged" in out["error"]
    assert out["degraded"] is True


def test_phase_failure_degrades_but_continues_when_backend_alive(
    capsys, monkeypatch
):
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: (True, 1, ""))
    rec = bench._Record()
    phases = bench._Phases(rec)
    ran = []
    assert not phases.run("p1", lambda: (_ for _ in ()).throw(ValueError("x")))
    assert phases.run("p2", lambda: ran.append("p2"))
    assert ran == ["p2"]
    assert rec.out["phase_errors"] == ["p1: ValueError: x"]
    assert not phases.dead
    # Each phase boundary emitted a parseable checkpoint line.
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    assert json.loads(lines[-1])["degraded"] is True


def test_phase_failure_stops_launches_when_backend_dead(capsys, monkeypatch):
    monkeypatch.setattr(
        bench, "_probe_backend", lambda **kw: (False, 2, "down")
    )
    rec = bench._Record()
    phases = bench._Phases(rec)
    ran = []
    assert not phases.run("p1", lambda: (_ for _ in ()).throw(OSError("rpc")))
    assert phases.dead
    assert not phases.run("p2", lambda: ran.append("p2"))
    assert ran == []
    assert rec.out["phase_errors"] == [
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


@pytest.mark.skipif(sys.platform != "linux", reason="signal semantics")
def test_supervisor_bounds_child_and_tail_is_complete_json():
    """Round-5 armor: the parent supervisor SIGKILLs the measurement child
    at the wall-clock deadline, exits 0, and the TAIL stdout line is a
    complete JSON record (the child's initial checkpoint at minimum) --
    never a blank, never a half-flushed line. The child here is the real
    bench.py measurement process; its initial checkpoint emits before any
    jax import, so a 12 s budget exercises kill-while-measuring."""
    env = dict(os.environ, BENCH_DEADLINE_S="12", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-u", str(_BENCH_PATH)],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert lines, "supervisor must always leave a record"
    out = json.loads(lines[-1])
    assert out["unit"] == "x-target"
    assert "vs_baseline" in out
