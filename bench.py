"""Benchmark: Pallas kernels with full reference parameters on the attached
TPU chip. Prints a full JSON record line after EVERY completed phase (the
driver reads the tail line, so the last one wins); even a SIGKILL mid-phase
leaves the previous checkpoint as a parseable record:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The target-bearing field is `vs_baseline_turbo_modes`: the geometric mean of
the best QUALITY-GATED turbo bilateral (/5 Gpix/s) and turbo NLM
(/0.5 Gpix/s) 4K throughputs -- the BASELINE.json targets are only reachable
by the gated approximate modes (the measured VPU ceiling caps any EXACT
1681-tap bilateral at ~128 Mpix/s; docs/PERFORMANCE.md). `value`/
`vs_baseline` keep their historical semantics: the exact-kernel geomean.

Deadline safety (round-4 VERDICT #1 -- BENCH_r04.json was rc=124/parsed=null
because the driver's external timeout killed the process before the single
final emit): the process is a PARENT SUPERVISOR that never imports jax; the
measurement runs in a child (BENCH_CHILD=1). The round-5 builder run
observed a backend wedge that held the GIL for 40+ minutes -- which freezes
in-process watchdog threads AND Python signal handlers -- so only a
separate process can bound it: the parent proxies the child's checkpoint
lines, SIGKILLs the child at the total wall-clock budget (BENCH_DEADLINE_S
env, default 840 s) or on its own SIGTERM/SIGINT, re-prints the last
COMPLETE JSON record (the tail can never be a half-flushed line), and
always exits 0. The child keeps a graceful in-process watchdog + signal
handlers (they win when the GIL is free), orders phases value-first,
checkpoints after every measured setting, skips work that no longer fits
the budget (with a note), and scales the backend probe window to the
remaining budget. The reference prints its timing in-band on every run
unconditionally (src/main.cpp:1924-1933, 1095-1102) -- this is the analog
that survives contact with a bounded driver.

Resilience (round-3/4): the tunneled axon backend wedges for long stretches
(compile plane AND data plane -- see CLAUDE.md), so before any measurement
this script probes BOTH planes in a SUBPROCESS (a wedged device_put hangs
forever in-process; the subprocess bounds it); every measurement phase is
individually fenced so one failure degrades the record instead of blanking
it.

Timing: the shared K-chain slope (utils/chiptime.py, refeed mode so every
chained application sees the ORIGINAL content -- required since the turbo
slice kernel culls intensity levels per tile). Every throughput row
publishes its fit spread as `<row>_spread`.

Content: turbo bilateral rows are measured on `render` (synthetic
render-like scene + noise -- the reference's actual workload class) and the
K=5/d8 headline rows also on `noise` (iid uniform -- the data-independent
worst case; no tile can cull). The headline turbo geomean uses render; the
noise floor rides the *_noise fields. K=6 rows keep render-only for
cross-round comparability (round-5 wall-clock trim).

Quality gates: every approximate setting is gated at 40 dB vs the exact
kernels at BOTH the 512x1024 sinusoid content and the SHIPPING 4K tile
configuration on render content, through the same Pallas paths the
throughput rows run. Exact 4K outputs are computed ONCE and reused across
gate phases (round-4 VERDICT weak #2). Gate-failing rows publish raw
throughput with gate_ok=false and are excluded from the geomean. Each
headline row measures AND gates as one unit before the next row starts
(round-5 run 2a lesson: a rows-then-gates ordering lost the NLM gate to
the deadline, zeroing the geomean despite green bilateral gates), so
vs_baseline_turbo_modes is nonzero as soon as the first bilateral unit and
the first NLM unit complete. Within a unit only the 4K cell gates (the
TIGHTER cell in every round-4/5 capture); the sinusoid cells run in a
follow-up phase (gates_small) that can DOWNGRADE gate_ok and re-emit.

Program economy: on slow sessions the dominant cost is neither FLOPs nor
compiles (persistent-cached) but the per-process EXECUTABLE LOAD of every
distinct program through the ~1 MB/s tunnel (round-5 run 3: 278 s for
three content programs; one NLM chain program 290 s; the NLM gate it lost
to the deadline) -- so the critical path to the first nonzero geomean is
budgeted in PROGRAMS: one fused content program (clean scene + all four 4K
realizations in one jit), then per headline unit ONE chain program (its
k=0 output is the un-chained turbo result the 4K gate needs -- chiptime
with_output) plus the exact-reference program -- itself a chain program
whose k=0 output is the gate reference AND whose slope is the
bilateral_4k/nlm_4k exact timing row (one load serves both; exact-kernel
cost is content-independent, so render-content timing equals the
historical noise-content timing). Frames are chain ARGUMENTS
rather than closures, so the noise-content rows re-time the render row's
program (slope_from_program: zero loads) and the NLM/layers gates reuse
the measured program on the gate content.

New round-5 rows: `turbo_d8s6_*` -- the d=8 grid gated at sigma_spatial=6
(at the reference's sigma_s=2 the d=8 pool must over-blur; the measured
quality crossover is sigma_s ~5-6, docs/PERFORMANCE.md), CLI-reachable via
`--turbo 8 --sigma-spatial 6`; `nlm_turbo_s6hrwdisk_*` -- the s=6 disk trim
stacked with the half-res weight field (CLI `--turbo D --search-radius 6
--search-disk --weights-halfres`; CPU screen: quality-neutral vs s6disk,
hrw's measured ~+19% speed -- the geomean carrier if its thin 4K gate
holds); and `temporal_fps_1080p[_turbo]` -- frames/s
of the flagship temporal config (5-frame multiframe NLM, one frame-batched
kernel launch + normalize) at 1080p, device-resident
(/root/reference/src/main.cpp:1539-1624 is the reference's flagship loop).

Exact-kernel regression checks: all kernel families compile on the chip and
PSNR-check against their NumPy oracles at 96x128, AND against the XLA
variants at a 1080p-scale shape; any failure lands in
"exact_check_failures" and zeroes vs_baseline (all variants).
"""

from __future__ import annotations

import json
import math
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

GATE_DB = 40.0
# Total wall-clock budget. A bounded default still matters (the child must
# emit a FINAL clean record before any unknown external timeout), but the
# per-unit checkpoint lines mean a driver budget SMALLER than this still
# parses the tail checkpoint (BENCH_r04 showed the driver reads the tail
# even on rc=124) -- so the default errs long: slow sessions load each
# ~30 MB cached executable through a ~1 MB/s tunnel (round-5 run 3: 278 s
# for THREE content programs), and an 840 s budget lost the NLM gate to
# exactly that.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
# BENCH_SMOKE=1: tiny shapes on the CPU backend with the probe stubbed out --
# exercises the FULL bench wiring (phase ordering, lambdas, field names,
# gating + assembly logic) without a chip. Throughput numbers are
# meaningless in this mode; gates still reflect real kernel quality at the
# smoke shapes.
SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"
_T0 = time.monotonic()


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


# Bilateral-grid settings shipped through --turbo D (ops/fast.py); K is the
# Session.run_turbo(levels=) knob. Priority-ordered (value-first): the K=5
# rows are the round-4 shipping defaults at d=2/d=4 (identical dB to K=6 at
# every d on both gate contents, tools/quality_ladders_r3.py; +10-16% at d=4
# and +11-13% at d=2 measured); d8s6 is the round-5 gated configuration of
# the fastest mode; K=6 rows ride last for cross-round comparability.
# Entries: (d, levels, sigma_spatial or None for the reference default).
TURBO_SETTINGS = (
    (4, 5, None),
    (2, 5, None),
    (8, 6, 6.0),
    (8, 6, None),
    (4, 6, None),
    (2, 6, None),
)
# The first three settings are the HEADLINE rows (the shipping defaults +
# the d8s6 gated configuration): each measures AND gates as one unit before
# the next starts (the explicit headline_* phases in _measure), so a driver
# budget that truncates the run still carries vs_baseline_turbo_modes
# (round-5 run 2a: rows-then-gates ordering lost the NLM gate to the
# deadline and the geomean read 0.0 despite three green bilateral gates).
TURBO_REST = TURBO_SETTINGS[3:]
# Settings that also get a noise-content throughput row (headline rows only;
# round-5 wall-clock trim -- K=6 rows measured identical noise ratios in the
# round-4 captures).
TURBO_NOISE = {(4, 5, None), (2, 5, None), (8, 6, 6.0)}
# NLM turbo settings, priority-ordered: (search_radius, stride, disk, hrw).
# s6disk (27 candidates) is the fastest gated row of the round-4 capture;
# disk (37) has the widest quality margin (41.6/41.8 dB CPU screen);
# s6hrwdisk (round 5) stacks the half-res weight field on s6disk -- the CPU
# screen puts it within 0.15 dB of s6disk on both gate contents (40.44 dB
# sinusoid / 39.78 dB 540p-crop vs s6disk's 40.48/39.64: hrw's weight
# smoothing is quality-neutral-to-regularizing) at hrw's ~+19% measured
# speed, so if it gates at 4K it becomes the geomean carrier. The best
# GATED row carries the geomean.
NLM_TURBO_SETTINGS = (
    (6, 2, True, False),
    (7, 2, True, False),
    (6, 2, True, True),
    (7, 2, False, False),
    (6, 2, False, False),
    (7, 2, True, True),
    (7, 2, False, True),
)
# The first three NLM rows are headline units (measure + gate before the
# rest phases run): s6disk carries the geomean in every round-4/5 capture;
# disk is the quality-margin backup; s6hrwdisk is the round-5 challenger
# (it rides LAST of the headline units so a thin-margin gate failure can
# never cost the time-to-first-geomean).
NLM_REST = NLM_TURBO_SETTINGS[3:]
# Guided-layers turbo downsamples (per-layer unit of the layers battery
# config, /root/reference/src/main.cpp:1957). K=5 is the round-5 shipping
# default for the layers family too (quality within 0.1-0.3 dB of K=6,
# tools/layers_k5_screen_r4.py; speed +7.2% at d=2 / +18-51% at d=4
# interleaved, tools/layers_k_ab_r4.py) -- the rows and gates below measure
# the shipped configuration.
LAYERS_TURBO_DS = (2, 4)
LAYERS_LEVELS = 5

_PROBE_SRC = (
    "import jax, jax.numpy as jnp, numpy as np;"
    "print(float(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 128)))));"
    "a = jax.device_put(np.ones((1024, 1024), np.float32));"
    "print(float(jax.jit(lambda v: v.sum())(a)))"
)


def _probe_backend(window_s: float, attempt_timeout: float = 240.0):
    """Probe the compile plane (tiny jit) AND the data plane (a ~4 MB
    device_put + readback) in a subprocess, retrying with backoff until the
    window closes. Returns (ok, attempts, last_error). The subprocess is the
    whole point: a wedged transfer hangs forever in-process, and CLAUDE.md's
    wedge guidance is to probe small and poll rather than queue big work."""
    deadline = time.monotonic() + window_s
    attempt, last = 0, ""
    while True:
        attempt += 1
        budget = max(30.0, min(attempt_timeout, deadline - time.monotonic()))
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True,
                text=True,
                timeout=budget,
            )
            if r.returncode == 0:
                return True, attempt, ""
            last = (r.stderr or r.stdout or "backend error")[-300:]
        except subprocess.TimeoutExpired:
            last = f"probe timeout ({budget:.0f} s)"
        if time.monotonic() >= deadline - 1.0:
            return False, attempt, last
        time.sleep(min(45.0, 5.0 * attempt))


class _Record:
    """All measured state + the emit path. `emit()` assembles the full JSON
    record from whatever has been measured so far and prints it as one line
    (stdout, flushed); it is called after every completed phase, from the
    deadline watchdog, and from the signal handlers -- the driver parses the
    LAST line, so each call supersedes the previous checkpoint."""

    def __init__(self):
        # Reentrant: the SIGTERM handler may fire while emit() holds the
        # lock in the main thread; a plain Lock would deadlock there.
        self.lock = threading.RLock()
        self.done = False
        self.out: dict = {
            "metric": (
                "gated-turbo 4K throughput (vs_baseline_turbo_modes is the "
                "target-bearing field: geomean of best GATED turbo bilateral"
                "/5Gpix + turbo NLM/0.5Gpix); value/vs_baseline = exact-"
                "kernel geomean (VPU-ceiling-bound, docs/PERFORMANCE.md)"
            ),
            "value": 0.0,
            "unit": "x-target",
            "vs_baseline": 0.0,
        }
        # Raw measurement state, keyed by setting tuples.
        self.turbo: dict = {}  # (content, d, K, sigma) -> (mpix, fit)
        self.gates: dict = {}  # (d, K, sigma) -> (db_small, db_4k)
        self.gate_ok: dict = {}
        self.nlm_turbo: dict = {}
        self.nlm_gates: dict = {}
        self.nlm_gate_ok: dict = {}
        self.layers_turbo: dict = {}
        self.layers_gates: dict = {}
        self.layers_gate_ok: dict = {}
        self.failures: list[str] = []

    def note(self, msg: str) -> None:
        with self.lock:
            self.out.setdefault("phase_errors", []).append(msg[:300])

    @staticmethod
    def _tag(d: int, K: int, sigma) -> str:
        tag = f"turbo_d{d}" if K == 6 else f"turbo_d{d}k{K}"
        if sigma is not None:
            tag += f"s{sigma:g}"
        return tag

    def _assemble(self) -> None:
        out = self.out
        # Snapshot the raw dicts (C-level copies, atomic under the GIL): the
        # watchdog thread can assemble while the main thread is inserting.
        turbo = dict(self.turbo)
        gates = dict(self.gates)
        gate_ok = dict(self.gate_ok)
        nlm_turbo = dict(self.nlm_turbo)
        nlm_gates = dict(self.nlm_gates)
        nlm_gate_ok = dict(self.nlm_gate_ok)
        layers_turbo = dict(self.layers_turbo)
        layers_gates = dict(self.layers_gates)
        layers_gate_ok = dict(self.layers_gate_ok)
        failures = list(self.failures)
        for d, K, sg in TURBO_SETTINGS:
            tag = self._tag(d, K, sg)
            if ("render", d, K, sg) in turbo:
                mpix_r, fit_r = turbo[("render", d, K, sg)]
                out[f"{tag}_4k_mpix_s"] = round(mpix_r, 1)
                out[f"{tag}_4k_spread"] = round(float(fit_r.spread), 3)
            if ("noise", d, K, sg) in turbo:
                mpix_n_, fit_n_ = turbo[("noise", d, K, sg)]
                out[f"{tag}_4k_mpix_s_noise"] = round(mpix_n_, 1)
                out[f"{tag}_4k_spread_noise"] = round(float(fit_n_.spread), 3)
            if (d, K, sg) in gates:
                db_s, db_4 = gates[(d, K, sg)]
                if db_s is not None:  # small cell rides a follow-up phase
                    out[f"{tag}_db_vs_exact"] = round(db_s, 1)
                if db_4 is not None:
                    out[f"{tag}_db_vs_exact_4k"] = round(db_4, 1)
                out[f"{tag}_gate_ok"] = bool(gate_ok.get((d, K, sg), False))

        headline_key = (7, 2, False, False)
        nlm_tags = {
            headline_key: "nlm_turbo",
            (6, 2, False, False): "nlm_turbo_s6",
            (7, 2, True, False): "nlm_turbo_disk",
            (6, 2, True, False): "nlm_turbo_s6disk",
            (7, 2, False, True): "nlm_turbo_hrw",
            (7, 2, True, True): "nlm_turbo_hrwdisk",
            (6, 2, True, True): "nlm_turbo_s6hrwdisk",
        }
        for key, tag in nlm_tags.items():
            if key in nlm_turbo:
                mpix_nt, fit_nt = nlm_turbo[key]
                if key == headline_key:
                    # Historical field semantics: the headline row zeroes its
                    # published throughput when it fails (or lacks) its gate.
                    mpix_nt = (
                        mpix_nt if nlm_gate_ok.get(key, False) else 0.0
                    )
                out[f"{tag}_4k_mpix_s"] = round(mpix_nt, 1)
                out[f"{tag}_4k_spread"] = round(float(fit_nt.spread), 3)
            if key in nlm_gates:
                db_s, db_4 = nlm_gates[key]
                if db_s is not None:  # small cell rides a follow-up phase
                    out[f"{tag}_db_vs_exact"] = round(db_s, 1)
                if db_4 is not None:
                    out[f"{tag}_db_vs_exact_4k"] = round(db_4, 1)
                if key != headline_key:
                    out[f"{tag}_gate_ok"] = bool(
                        nlm_gate_ok.get(key, False)
                    )

        for d in LAYERS_TURBO_DS:
            tag = f"layers_turbo_d{d}"
            if ("render", d) in layers_turbo:
                mpix_r, fit_r = layers_turbo[("render", d)]
                out[f"{tag}_mpix_s"] = round(mpix_r, 1)
                out[f"{tag}_spread"] = round(float(fit_r.spread), 3)
            if d in layers_gates:
                db_s, db_4 = layers_gates[d]
                if db_s is not None:  # small cell rides a follow-up phase
                    out[f"{tag}_db_vs_exact"] = round(db_s, 1)
                if db_4 is not None:
                    out[f"{tag}_db_vs_exact_4k"] = round(db_4, 1)
                out[f"{tag}_gate_ok"] = bool(layers_gate_ok.get(d, False))
            if f"{tag}_mpix_s" in out and not layers_gate_ok.get(d, False):
                # Gate-failing (or unmeasured) layers rows zero their
                # published throughput so a regression is record-visible.
                out[f"{tag}_mpix_s"] = 0.0

        # Headline geomeans. Only gate-passing settings carry the geomean;
        # gate-failing throughput is still published (with measured dB and
        # gate_ok=false) rather than silently zeroed.
        mpix_b = out.get("bilateral_4k_mpix_s", 0.0)
        mpix_n = out.get("nlm_4k_mpix_s", 0.0)
        vs_baseline = math.sqrt((mpix_b / 5000.0) * (mpix_n / 500.0))
        gated = [k for k in TURBO_SETTINGS if gate_ok.get(k, False)]
        best_turbo_render = max(
            (
                turbo[("render",) + k][0]
                for k in gated
                if ("render",) + k in turbo
            ),
            default=0.0,
        )
        best_turbo_noise = max(
            (
                turbo[("noise",) + k][0]
                for k in gated
                if ("noise",) + k in turbo
            ),
            default=0.0,
        )
        best_nlm_turbo = max(
            (
                nlm_turbo[k][0]
                for k in NLM_TURBO_SETTINGS
                if nlm_gate_ok.get(k, False) and k in nlm_turbo
            ),
            default=0.0,
        )
        vs_baseline_turbo = math.sqrt(
            (best_turbo_render / 5000.0) * (best_nlm_turbo / 500.0)
        )
        vs_baseline_turbo_noise = math.sqrt(
            (best_turbo_noise / 5000.0) * (best_nlm_turbo / 500.0)
        )
        if failures:
            vs_baseline = 0.0
            vs_baseline_turbo = 0.0
            vs_baseline_turbo_noise = 0.0
        out["exact_check_failures"] = failures
        out["value"] = round(vs_baseline, 4)
        out["vs_baseline"] = round(vs_baseline, 4)
        out["vs_baseline_turbo_modes"] = round(vs_baseline_turbo, 4)
        out["vs_baseline_turbo_modes_noise"] = round(vs_baseline_turbo_noise, 4)
        out["elapsed_s"] = round(time.monotonic() - _T0, 1)
        if "phase_errors" in out:
            out["degraded"] = True

    def emit(self) -> None:
        with self.lock:
            try:
                self._assemble()
            except Exception as e:  # noqa: BLE001 -- emit must never fail
                self.out["assemble_error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps(self.out), flush=True)


class _Phases:
    """Run measurement phases with individual failure fencing AND deadline
    gating: a phase whose estimated cost no longer fits the remaining budget
    is skipped with a note; a phase that raises records its error and -- if
    a quick re-probe says the backend is gone -- stops launching further
    phases. A checkpoint record is emitted after every phase either way."""

    # Wall-clock reserved for the final emit + interpreter teardown.
    RESERVE_S = 20.0

    def __init__(self, rec: _Record):
        self.rec = rec
        self.dead = False

    def run(self, name: str, fn, est_s: float = 60.0) -> bool:
        ok = False
        if self.dead:
            self.rec.note(f"{name}: skipped (backend down)")
        elif _remaining() < est_s + self.RESERVE_S:
            self.rec.note(
                f"{name}: skipped (deadline: {_remaining():.0f}s left, "
                f"needs ~{est_s:.0f}s)"
            )
        else:
            try:
                fn()
                ok = True
            except Exception as e:  # noqa: BLE001 -- record, degrade, go on
                self.rec.note(f"{name}: {type(e).__name__}: {e}")
                window = max(30.0, min(180.0, _remaining() * 0.2))
                alive, _, _ = _probe_backend(
                    window_s=window, attempt_timeout=120.0
                )
                if not alive:
                    self.dead = True
        self.rec.emit()  # checkpoint: the last printed line wins
        return ok


def _measure(rec: _Record, phases: _Phases) -> None:
    import jax

    from image_denoising_filter_tpu.utils import chiptime, compile_cache

    compile_cache.enable()

    from image_denoising_filter_tpu.config import (
        BilateralParams,
        CpuBilateralParams,
        LayersParams,
        NlmParams,
        TilingConfig,
    )
    from image_denoising_filter_tpu.ops import (
        bilateral,
        bilateral_fast,
        bilateral_xla,
        cross_bilateral_layers,
        cross_bilateral_layers_fast,
        cross_bilateral_layers_xla,
        nlm_accumulate,
        nlm_accumulate_frames,
        nlm_xla,
        normalize,
        normalize_layers_fast,
    )
    from image_denoising_filter_tpu.ops import reference as ref
    from image_denoising_filter_tpu.utils.content import (
        synthetic_render_device,
        synthetic_render_expr,
    )

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    out = rec.out
    h, w = (256, 512) if SMOKE else (2160, 3840)  # 4K
    n_px = h * w
    rng = np.random.default_rng(0)
    # Representative frames: opaque alpha (every LDR render), which enables
    # the exact uniform-alpha fast path that Session auto-selects.
    # Content is generated ON DEVICE: the tunneled host->device path runs at
    # ~1 MB/s on bad sessions (round-5 run 1 spent ~900 s of its first phase
    # on 4x132 MB frame uploads), so NO 4K frame crosses the tunnel -- the
    # clean render scene is evaluated on device (synthetic_render_device,
    # parameter-identical to the host generator), and the iid-uniform
    # worst-case frames and the N(0, 0.05) render noise realizations come
    # from the device PRNG. Same content classes as every capture before
    # round 5; realizations differ (numbers are per-session anyway).
    t0_content = time.monotonic()
    _scene = synthetic_render_expr(h, w, seed=1)

    @jax.jit
    def _mk_all(key):
        # ONE program for the clean scene + all four 4K realizations: each
        # distinct program costs an executable load through the ~1 MB/s
        # tunnel on slow sessions (round-5 run 3 spent 278 s on THREE
        # content programs), so the whole content phase is a single load.
        clean = _scene()
        k1, k2, k3, k4 = jax.random.split(key, 4)
        mk_u = lambda kk: jax.random.uniform(  # noqa: E731
            kk, (h, w, 4), jnp.float32
        ).at[..., 3].set(1.0)
        mk_r = lambda kk: (  # noqa: E731
            clean + 0.05 * jax.random.normal(kk, (h, w, 4), jnp.float32)
        ).at[..., 3].set(1.0)
        return clean, mk_u(k1), mk_u(k2), mk_r(k3), mk_r(k4)

    render_clean, noise, noise2, render, render2 = _mk_all(
        jax.random.PRNGKey(0)
    )
    for a in (render_clean, noise, noise2, render, render2):
        float(a[0, 0, 0])  # real fence (block_until_ready does not fence
        # through the tunnel, CLAUDE.md)
    with rec.lock:
        out["content_s"] = round(time.monotonic() - t0_content, 1)

    # Device-side PSNR for the 4K gate cells: a 4K frame readback through
    # the tunnel costs minutes; a jitted MSE + scalar readback costs one
    # fence. Matches ref.psnr (peak 1.0) on the RGB planes.
    @jax.jit
    def _mse_rgb(a, b):
        d = a[..., :3].astype(jnp.float32) - b[..., :3].astype(jnp.float32)
        return jnp.mean(d * d)

    def psnr_dev(a, b) -> float:
        mse = float(_mse_rgb(a, b))
        if mse == 0.0:
            return float("inf")
        return -10.0 * math.log10(mse)

    bp = BilateralParams(uniform_alpha=True)  # radius 20 (reference GPU params)
    nlp = NlmParams(uniform_alpha=True)  # s=7 p=3 h=0.5
    bf16 = TilingConfig(compute_dtype="bfloat16")

    def bparams(sigma) -> BilateralParams:
        if sigma is None:
            return bp
        return BilateralParams(uniform_alpha=True, sigma_spatial=float(sigma))

    def put(key: str, value, nd: int = 1) -> None:
        with rec.lock:
            out[key] = round(float(value), nd)

    def put_fit(key: str, mpix: float, fit) -> None:
        with rec.lock:
            out[f"{key}_mpix_s"] = round(float(mpix), 1)
            out[f"{key}_spread"] = round(float(fit.spread), 3)

    # --- quality gate content ------------------------------------------------
    # (a) 512x1024 structured sinusoids (the round-1/2 gate content);
    # (b) the SHIPPING 4K tile configuration on render content, so a
    #     tile-clamp bug at 4K zeroes the contribution.
    # The clean sinusoid plane crosses the tunnel ONCE (~8 MB) and ONLY
    # when the small cells are reached: the noisy realizations are derived
    # on device (the tunnel runs ~1 MB/s on bad sessions -- round-5 run 1
    # spent ~900 s uploading 4K frames), and nothing small-content-related
    # sits on the critical path to the first geomean.
    gh_, gw_ = (128, 256) if SMOKE else (512, 1024)
    yy, xx = np.mgrid[0:gh_, 0:gw_].astype(np.float32)
    clean_s = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            0.5 + 0.4 * np.cos(xx / 53.0 + yy / 31.0),
            0.5 + 0.3 * np.sin((xx + yy) / 41.0),
            np.ones_like(xx),
        ],
        axis=-1,
    ).astype(np.float32)
    _small_content: dict = {}

    def gate_small_content():
        """Lazy: upload the clean sinusoid plane once and derive the two
        noisy realizations on device. Returns (clean_dev, nz_d, nz2_d)."""
        if "nz" not in _small_content:
            clean_dev = jax.device_put(clean_s)

            @jax.jit
            def _mk(key):
                img = clean_dev + 0.05 * jax.random.normal(
                    key, clean_dev.shape, jnp.float32
                )
                return img.at[..., 3].set(1.0)

            g1_, g2_ = jax.random.split(jax.random.PRNGKey(7))
            _small_content["clean"] = clean_dev
            _small_content["nz"] = _mk(g1_)
            _small_content["nz2"] = _mk(g2_)
        return (
            _small_content["clean"],
            _small_content["nz"],
            _small_content["nz2"],
        )

    # --- headline units: throughput + 4K gate per setting, value-first ------
    # vs_baseline_turbo_modes needs ONE gated bilateral row and ONE gated
    # NLM row. Round-5 builder run 2a lost its NLM gate to the deadline
    # under the rows-then-gates ordering; run 3 (unit ordering, 840 s) lost
    # it again to per-program executable loads on a slow session (~30 MB
    # each through a ~1 MB/s tunnel). Each unit below lands a row AND its
    # 4K gate cell -- the TIGHTER cell in every round-4/5 capture -- before
    # the next unit starts; the 512x1024 sinusoid cells run as a follow-up
    # phase (gates_small) that can DOWNGRADE gate_ok and re-emit, keeping
    # ~7 program loads off the critical path to the first geomean. Order:
    # d4k5 (shipping default) -> s6disk NLM (fastest gated NLM row) ->
    # d8s6 (fastest gated bilateral) -> d2k5 (the >=2,400 Mpix/s render
    # target row) -> disk NLM (quality-margin backup).
    exact_b_small: dict = {}
    exact_b_4k: dict = {}
    exact_n: dict = {}
    # (family, setting) -> (chain program, ks): the compiled K-chain program
    # of every measured row, kept so (a) the 4K gate cell reuses it at k=0
    # (its second output is exactly one un-chained application -- no second
    # executable load) and (b) the noise-content rows re-time the SAME
    # program on the noise frame (slope_from_program: no load at all).
    chain_prog: dict = {}

    def _pair_ok(pair) -> bool:
        db_s, db_4 = pair
        return (
            db_4 is not None
            and db_4 >= GATE_DB
            and (db_s is None or db_s >= GATE_DB)
        )

    def _bilateral_ks(d: int):
        # Chain length scales with speed: the sub-1 ms d=8 pipeline needs
        # k up to 64 to pull its slope off the method's resolution floor
        # (k is a dynamic arg: no extra compiles).
        return (1, 16, 64) if d >= 8 else (1, 8, 32) if d > 2 else (1, 4, 16)

    def _exact_bilateral_4k(sg):
        """Exact 4K bilateral reference for sigma `sg`, computed ONCE per
        sigma -- via an exact-kernel CHAIN program whose k=0 output is the
        reference and whose slope is the `bilateral_4k` row (for the
        reference sigma), so the gate and the exact-timing row share one
        executable load. The disk-run kernel's cost is content-independent
        (fixed taps), so timing on render equals the historical noise-content
        timing."""
        if sg not in exact_b_4k:
            bp_s = bparams(sg)
            fit, run = chiptime.slope_time(
                lambda x: bilateral(x, bp_s),
                render,
                ks=(1, 2, 4),
                with_output=True,
            )
            exact_b_4k[sg] = run(0, render)[1]
            if sg is None and "bilateral_4k_mpix_s" not in out:
                put_fit("bilateral_4k", fit.mpix_s(n_px), fit)
        return exact_b_4k[sg]

    def gate_bilateral_one(d, K, sg, cells=("4k",)) -> None:
        bp_s = bparams(sg)
        db_s, db_4 = rec.gates.get((d, K, sg), (None, None))
        if "4k" in cells:
            _exact_bilateral_4k(sg)
            prog = chain_prog.get(("b", d, K, sg))
            got = (
                prog[0](0, render)[1]  # the measured program, un-chained
                if prog is not None
                else bilateral_fast(render, bp_s, K, d)
            )
            db_4 = psnr_dev(got, exact_b_4k[sg])
        if "small" in cells:
            _, nz_d, _ = gate_small_content()
            if sg not in exact_b_small:
                exact_b_small[sg] = bilateral(nz_d, bp_s)
            db_s = psnr_dev(
                bilateral_fast(nz_d, bp_s, K, d), exact_b_small[sg]
            )
        rec.gates[(d, K, sg)] = (db_s, db_4)
        rec.gate_ok[(d, K, sg)] = _pair_ok((db_s, db_4))
        rec.emit()  # per-setting checkpoint

    def measure_bilateral_render(d, K, sg, reps=5) -> None:
        bp_s = bparams(sg)
        ks = _bilateral_ks(d)
        fit, run = chiptime.slope_time(
            lambda x: bilateral_fast(x, bp_s, K, d),
            render,
            ks=ks,
            repeats=reps,
            with_output=True,
        )
        chain_prog[("b", d, K, sg)] = (run, ks)
        rec.turbo[("render", d, K, sg)] = (fit.mpix_s(n_px), fit)
        rec.emit()  # per-setting checkpoint

    def measure_bilateral_noise(d, K, sg) -> None:
        # Re-time the render row's compiled chain program on the noise
        # frame: zero compiles, zero executable loads.
        run, ks = chain_prog[("b", d, K, sg)]
        fit = chiptime.slope_from_program(run, noise, ks=ks, repeats=5)
        rec.turbo[("noise", d, K, sg)] = (fit.mpix_s(n_px), fit)
        rec.emit()  # per-setting checkpoint

    def unit_bilateral(d, K, sg, reps=5) -> None:
        measure_bilateral_render(d, K, sg, reps=reps)
        gate_bilateral_one(d, K, sg)

    def _nlm_params(key) -> NlmParams:
        s_r, st, disk, hrw = key
        return NlmParams(
            uniform_alpha=True,
            search_radius=s_r,
            search_stride=st,
            search_disk=disk,
            weights_halfres=hrw,
        )

    def _exact_nlm_4k():
        """Exact 4K NLM reference (shared by every NLM gate), via an exact
        CHAIN program whose k=0 output is the reference pair and whose slope
        is the `nlm_4k` row -- one executable load for both. Box-sum SSD
        cost is content-independent, so timing on render equals the
        historical noise-content timing."""
        if "4k" not in exact_n:
            fit, run = chiptime.slope_time(
                lambda nb, tgt: nlm_accumulate(tgt, nb, nlp),
                render2,
                render,
                ks=(1, 2, 4),
                with_output=True,
            )
            exact_n["4k"] = normalize(*run(0, render2, render)[1])
            if "nlm_4k_mpix_s" not in out:
                put_fit("nlm_4k", fit.mpix_s(n_px), fit)
        return exact_n["4k"]

    def gate_nlm_one(key, cells=("4k",)) -> None:
        nlp_g = _nlm_params(key)
        db_s, db_4 = rec.nlm_gates.get(key, (None, None))
        if "4k" in cells:
            _exact_nlm_4k()
            prog = chain_prog.get(("n", key))
            pair = (
                prog[0](0, render2, render)[1]  # measured program, un-chained
                if prog is not None
                else nlm_accumulate(render, render2, nlp_g, bf16)
            )
            db_4 = psnr_dev(normalize(*pair), exact_n["4k"])
        if "small" in cells:
            _, nz_d, nz2_d = gate_small_content()
            if "small" not in exact_n:
                exact_n["small"] = normalize(
                    *nlm_accumulate(nz_d, nz2_d, nlp)
                )
            db_s = psnr_dev(
                normalize(*nlm_accumulate(nz_d, nz2_d, nlp_g, bf16)),
                exact_n["small"],
            )
        rec.nlm_gates[key] = (db_s, db_4)
        rec.nlm_gate_ok[key] = _pair_ok((db_s, db_4))
        rec.emit()  # per-setting checkpoint

    def unit_nlm(key, cells=("4k",)) -> None:
        nlp_t = _nlm_params(key)
        # The target frame is a chain ARGUMENT (not a closure), so the same
        # program serves the noise-content measurement and -- via k=0 on
        # (render2, render) -- the 4K gate cell. fn returns the (wc, nw)
        # pair; the chain's data dependence rides wc, and the pallas kernel
        # computes both outputs regardless, so the measured slope is the
        # same accumulate cost as prior rounds.
        fit, run = chiptime.slope_time(
            lambda nb, tgt: nlm_accumulate(tgt, nb, nlp_t, bf16),
            noise2,
            noise,
            ks=(1, 4, 10),
            with_output=True,
        )
        chain_prog[("n", key)] = (run, (1, 4, 10))
        rec.nlm_turbo[key] = (fit.mpix_s(n_px), fit)
        rec.emit()  # per-setting checkpoint
        gate_nlm_one(key, cells=cells)

    phases.run("headline_d4k5", lambda: unit_bilateral(4, 5, None), est_s=90)
    phases.run(
        "headline_nlm_s6disk",
        lambda: unit_nlm((6, 2, True, False)),
        est_s=90,
    )
    phases.run("headline_d8s6", lambda: unit_bilateral(8, 6, 6.0), est_s=60)
    phases.run("headline_d2k5", lambda: unit_bilateral(2, 5, None), est_s=60)
    phases.run(
        "headline_nlm_disk", lambda: unit_nlm((7, 2, True, False)), est_s=60
    )
    phases.run(
        "headline_nlm_s6hrwdisk",
        lambda: unit_nlm((6, 2, True, True)),
        est_s=60,
    )

    # --- exact kernels at 4K (value/vs_baseline; content-independent cost) --
    def phase_exact_4k():
        # Normally free: the headline units' gates already timed both exact
        # rows through their reference chain programs (_exact_bilateral_4k /
        # _exact_nlm_4k). This phase only fills rows a failed headline unit
        # left missing.
        if "bilateral_4k_mpix_s" not in out:
            _exact_bilateral_4k(None)
        if "nlm_4k_mpix_s" not in out:
            _exact_nlm_4k()

    phases.run("exact_4k", phase_exact_4k, est_s=120)

    # --- small-content gate cells for the headline rows ----------------------
    # Completes the two-content gate contract: the 512x1024 sinusoid cell
    # for every row already gated at 4K. A sub-40 dB small cell DOWNGRADES
    # gate_ok and the re-emitted checkpoint supersedes the provisional one.
    def phase_gates_small():
        for key in list(rec.gates):
            if _remaining() < 45 + _Phases.RESERVE_S:
                rec.note("gates_small[bilateral]: truncated (deadline)")
                break
            gate_bilateral_one(*key, cells=("small",))
        for key in list(rec.nlm_gates):
            if _remaining() < 45 + _Phases.RESERVE_S:
                rec.note("gates_small[nlm]: truncated (deadline)")
                break
            gate_nlm_one(key, cells=("small",))

    phases.run("gates_small", phase_gates_small, est_s=150)

    # --- noise-content rows for the headline settings (iid uniform: the
    # data-independent worst case; no tile can cull) --------------------------
    def phase_turbo_noise():
        for d, K, sg in TURBO_SETTINGS:
            if (d, K, sg) not in TURBO_NOISE:
                continue
            if ("b", d, K, sg) not in chain_prog:
                rec.note(f"turbo_noise[d{d}K{K}]: skipped (no render unit)")
                continue
            if _remaining() < 45 + _Phases.RESERVE_S:
                rec.note(f"turbo_noise[d{d}K{K}]: skipped (deadline)")
                continue
            measure_bilateral_noise(d, K, sg)

    phases.run("turbo_noise", phase_turbo_noise, est_s=90)

    # --- comparability rows (K=6), each with its gate -------------------------
    def phase_rest_bilateral():
        for d, K, sg in TURBO_REST:
            if _remaining() < 60 + _Phases.RESERVE_S:
                rec.note(f"turbo_bilateral[d{d}K{K}]: skipped (deadline)")
                continue
            measure_bilateral_render(d, K, sg, reps=3)
            gate_bilateral_one(d, K, sg, cells=("4k", "small"))

    phases.run("turbo_bilateral_rest", phase_rest_bilateral, est_s=150)

    def phase_rest_nlm():
        # Per-setting fencing: one setting's compile failure records its
        # error and lets sibling rows land; a dead backend fails the phase
        # via the re-raised last error.
        last_err = None
        for key in NLM_REST:
            if _remaining() < 60 + _Phases.RESERVE_S:
                s_r, st, disk, hrw = key
                rec.note(
                    f"turbo_nlm[{s_r},{st},{int(disk)},{int(hrw)}]: "
                    "skipped (deadline)"
                )
                continue
            try:
                unit_nlm(key, cells=("4k", "small"))
            except Exception as e:  # noqa: BLE001
                last_err = e
                s_r, st, disk, hrw = key
                rec.note(
                    f"turbo_nlm[{s_r},{st},{int(disk)},{int(hrw)}]: "
                    f"{type(e).__name__}: {e}"
                )
        if last_err is not None and not rec.nlm_turbo:
            raise last_err

    phases.run("turbo_nlm_rest", phase_rest_nlm, est_s=150)

    # --- exact-family oracle checks (correctness guard for the headline) ----
    def phase_exact_checks_oracle():
        # 96x128 vs the NumPy oracles (catches Mosaic math regressions).
        small = np.asarray(rng.uniform(0, 1, (96, 128, 4)), np.float32)
        small2 = np.asarray(rng.uniform(0, 1, (96, 128, 4)), np.float32)
        sd, sd2 = jax.device_put(small), jax.device_put(small2)
        checks = {}
        bp_c = BilateralParams()
        checks["bilateral"] = ref.psnr(
            np.asarray(bilateral(sd, bp_c)),
            ref.bilateral_reference(small, bp_c),
        )
        nlp_c = NlmParams()
        wc_o, nw_o = ref.nlm_reference(small, small2, nlp_c)
        wc_k, nw_k = nlm_accumulate(sd, sd2, nlp_c)
        checks["nlm"] = ref.psnr(
            np.asarray(normalize(wc_k, nw_k)),
            ref.normalize_reference(wc_o, nw_o),
        )
        lp_c = LayersParams()
        lwc_o, lnw_o = ref.cross_bilateral_layers_reference(small, small2, lp_c)
        lwc_k, lnw_k = cross_bilateral_layers(sd, sd2, lp_c)
        checks["layers"] = ref.psnr(
            np.asarray(lwc_k), np.asarray(lwc_o).astype(np.float32)
        )
        checks["normalize"] = ref.psnr(
            np.asarray(normalize(lwc_k, lnw_k)),
            ref.normalize_reference(np.asarray(lwc_k), np.asarray(lnw_k)),
        )
        for name, db in checks.items():
            if not (db >= 80.0):  # oracle-exact kernels sit way above this
                rec.failures.append(f"{name}:{db:.1f}dB")

    phases.run("exact_checks_oracle", phase_exact_checks_oracle, est_s=90)

    # --- turbo guided layers (render content; per-layer battery unit) -------
    lp = LayersParams()
    _l_dev: dict = {}  # generate the 4K guide ONCE across the two phases

    def _layer_guide():
        if "g" not in _l_dev:
            # G-buffer-like guide, evaluated on device (no tunnel traffic).
            _l_dev["g"] = synthetic_render_device(h, w, seed=2)
        return _l_dev["g"]

    exact_l: dict = {}

    def unit_layers(d) -> None:
        # Measure + 4K gate as one unit from ONE chain program: the guide is
        # a chain ARGUMENT, so run(0, render, guide)[1] is exactly the
        # un-chained turbo output for the gate cell (no second load).
        l_dev = _layer_guide()
        fn = lambda t, g: normalize_layers_fast(  # noqa: E731
            *cross_bilateral_layers_fast(t, g, lp, LAYERS_LEVELS, d)
        )
        ks = (1, 4, 16) if d <= 2 else (1, 8, 32)
        fit, run = chiptime.slope_time(
            fn, render, l_dev, ks=ks, with_output=True
        )
        chain_prog[("l", d)] = (run, ks)
        rec.layers_turbo[("render", d)] = (fit.mpix_s(n_px), fit)
        rec.emit()  # per-setting checkpoint
        if "4k" not in exact_l:
            # 4K gate reference: the layers battery unit on render content
            # (clean guide), computed once across both d values.
            exact_l["4k"] = normalize(
                *cross_bilateral_layers(render, l_dev, lp)
            )
        db_4k = psnr_dev(run(0, render, l_dev)[1], exact_l["4k"])
        db_s, _ = rec.layers_gates.get(d, (None, None))
        rec.layers_gates[d] = (db_s, db_4k)
        rec.layers_gate_ok[d] = _pair_ok((db_s, db_4k))
        rec.emit()  # per-setting checkpoint

    def phase_turbo_layers():
        for d in LAYERS_TURBO_DS:
            if _remaining() < 90 + _Phases.RESERVE_S:
                rec.note(f"turbo_layers[d{d}]: skipped (deadline)")
                continue
            unit_layers(d)

    phases.run("turbo_layers", phase_turbo_layers, est_s=150)

    # --- layers small-content gate cells --------------------------------------
    def phase_gates_layers_small():
        # Sinusoid gate: guide = clean sinusoids, target = noisy realization.
        # Can DOWNGRADE gate_ok of a unit that already passed its 4K cell.
        guide_s, nz_d, _ = gate_small_content()
        exact_small = normalize(*cross_bilateral_layers(nz_d, guide_s, lp))
        for d in LAYERS_TURBO_DS:
            if d not in rec.layers_gates:
                continue  # the unit never ran; nothing to complete
            got_small = normalize_layers_fast(
                *cross_bilateral_layers_fast(
                    nz_d, guide_s, lp, LAYERS_LEVELS, d
                )
            )
            db_small = psnr_dev(got_small, exact_small)
            _, db_4k = rec.layers_gates[d]
            rec.layers_gates[d] = (db_small, db_4k)
            rec.layers_gate_ok[d] = _pair_ok((db_small, db_4k))
            rec.emit()  # per-setting checkpoint

    phases.run("gates_layers_small", phase_gates_layers_small, est_s=120)

    # --- temporal serving: 5-frame multiframe NLM fps at 1080p ---------------
    # The reference's flagship config is the temporal overlap loop
    # (src/main.cpp:1539-1624); this row is its device-resident rate: one
    # frame-batched accumulate over 5 neighbour frames + normalize per
    # output frame. Exact path and the best-gated turbo path (stride-2 disk
    # search, bf16 taps).
    def phase_temporal():
        hh, ww = (128, 256) if SMOKE else (1080, 1920)
        f_n = 2 if SMOKE else 5
        # Device crops + device noise: the 1080p target and the 5 neighbour
        # frames are derived from the already-resident clean scene instead
        # of shipping ~200 MB through the tunnel.
        tgt = jnp.asarray(render[:hh, :ww])

        @jax.jit
        def _mk_frames(key):
            fr = render_clean[None, :hh, :ww] + 0.05 * jax.random.normal(
                key, (f_n, hh, ww, 4), jnp.float32
            )
            return fr.at[..., 3].set(1.0)

        frames = _mk_frames(jax.random.PRNGKey(5))
        fit, run_e = chiptime.slope_time(
            lambda t, fr: normalize(*nlm_accumulate_frames(t, fr, nlp)),
            tgt,
            frames,
            ks=(1, 2, 4),
            with_output=True,
        )
        put("temporal_fps_1080p", 1.0 / fit.slope)
        with rec.lock:
            out["temporal_fps_1080p_spread"] = round(float(fit.spread), 3)
        nlp_t = NlmParams(
            uniform_alpha=True, search_stride=2, search_disk=True
        )
        fit_t, run_t = chiptime.slope_time(
            lambda t, fr: normalize(*nlm_accumulate_frames(t, fr, nlp_t, bf16)),
            tgt,
            frames,
            ks=(1, 4, 8),
            with_output=True,
        )
        put("temporal_fps_1080p_turbo", 1.0 / fit_t.slope)
        with rec.lock:
            out["temporal_fps_1080p_turbo_spread"] = round(
                float(fit_t.spread), 3
            )
        # Self-gate (round 5): both outputs come from the MEASURED chain
        # programs at k=0 -- zero extra loads -- so the record carries the
        # temporal turbo's dB-vs-exact alongside its fps.
        db_t = psnr_dev(run_t(0, tgt, frames)[1], run_e(0, tgt, frames)[1])
        put("temporal_turbo_db_vs_exact", db_t)
        with rec.lock:
            out["temporal_turbo_gate_ok"] = bool(db_t >= GATE_DB)

    phases.run("temporal_fps", phase_temporal, est_s=120)

    # --- exact kernels at 1080p (BASELINE.md names 1080p explicitly) --------
    def phase_exact_1080p():
        hh, ww = (128, 256) if SMOKE else (1080, 1920)
        na = jnp.asarray(noise[:hh, :ww])   # device crops: no tunnel traffic
        nb = jnp.asarray(noise2[:hh, :ww])
        fit_b = chiptime.slope_time(lambda x: bilateral(x, bp), na, ks=(1, 4, 8))
        put_fit("bilateral_1080p", fit_b.mpix_s(hh * ww), fit_b)
        fit_n = chiptime.slope_time(
            lambda y: nlm_accumulate(na, y, nlp)[0], nb, ks=(1, 4, 8)
        )
        put_fit("nlm_1080p", fit_n.mpix_s(hh * ww), fit_n)

    phases.run("exact_1080p", phase_exact_1080p, est_s=100)

    # --- exact checks at 1080p scale (Pallas vs XLA lowerings) --------------
    def phase_exact_checks_1080p():
        # Pallas vs the XLA variants at a 1080p-scale shape (same exact math
        # through an independent lowering) so a tile/halo/clamp bug at real
        # shapes fails the record. The 96x128 oracle checks cannot see
        # 4K-scale tiling bugs.
        hh, ww = (128, 256) if SMOKE else (1080, 1920)
        ra = jnp.asarray(render[:hh, :ww])  # device crops: no tunnel traffic
        rb = jnp.asarray(render2[:hh, :ww])
        checks = {}
        checks["bilateral_1080p"] = psnr_dev(
            bilateral(ra, bp), bilateral_xla(ra, bp)
        )
        wc_k, nw_k = nlm_accumulate(ra, rb, nlp)
        wc_x, nw_x = nlm_xla(ra, rb, nlp)
        checks["nlm_1080p"] = psnr_dev(
            normalize(wc_k, nw_k), normalize(wc_x, nw_x)
        )
        lwc_k, lnw_k = cross_bilateral_layers(ra, rb, lp)
        lwc_x, lnw_x = cross_bilateral_layers_xla(ra, rb, lp)
        checks["layers_1080p"] = psnr_dev(
            normalize(lwc_k, lnw_k), normalize(lwc_x, lnw_x)
        )
        for name, db in checks.items():
            if not (db >= 80.0):
                rec.failures.append(f"{name}:{db:.1f}dB")

    phases.run("exact_checks_1080p", phase_exact_checks_1080p, est_s=150)

    # --- PSNR parity vs the CPU bilateral reference --------------------------
    def phase_parity():
        # Our kernel in CPU-reference-params mode vs the CPU oracle (interior
        # only -- the CPU path zeroes a radius-wide border, main.cpp:1823-28).
        small = np.asarray(rng.uniform(0, 1, (96, 128, 4)), np.float32)
        cp = CpuBilateralParams()
        kernel_params = BilateralParams(
            radius=cp.radius,
            sigma_spatial=cp.sigma_spatial,
            sigma_color=cp.sigma_color,
            blue_bug=cp.blue_bug,
        )
        got = np.asarray(bilateral(jax.device_put(small), kernel_params))
        want = ref.cpu_bilateral_reference(small, cp)
        r = cp.radius
        interior = (slice(r, -r), slice(r, -r), slice(0, 3))
        put("psnr_parity_db", ref.psnr(got[interior], want[interior]))

    phases.run("parity", phase_parity, est_s=60)


def _supervisor_main() -> None:
    """Run the measurement in a CHILD process and supervise it from a parent
    that never imports jax. Round-5 lesson (builder run 1): a wedged backend
    call can hold the GIL for 40+ minutes, which freezes BOTH the in-process
    watchdog thread and the Python SIGTERM handler -- in-process armor
    cannot bound a GIL-holding wedge. The parent can: it proxies the child's
    checkpoint lines, kills the child (SIGKILL, exact pid) at the deadline
    or on its own SIGTERM/SIGINT, re-prints the last COMPLETE JSON record so
    the tail can never be a half-flushed line, and always exits 0."""
    env = dict(os.environ, BENCH_CHILD="1")
    # The child keeps its graceful in-process armor, aimed slightly earlier
    # than the parent's hard kill so the graceful path wins when the GIL is
    # free.
    env["BENCH_DEADLINE_S"] = str(max(30.0, DEADLINE_S - 25.0))
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        bufsize=1,
    )

    def _kill(signum=None, frame=None):  # noqa: ARG001
        try:
            proc.kill()
        except Exception:  # noqa: BLE001
            pass

    signal.signal(signal.SIGTERM, _kill)
    signal.signal(signal.SIGINT, _kill)
    timer = threading.Timer(max(10.0, DEADLINE_S - 10.0), _kill)
    timer.daemon = True
    timer.start()

    last_json = None
    try:
        for line in proc.stdout:
            line = line.rstrip("\n")
            if line.startswith("{"):
                try:
                    json.loads(line)
                    last_json = line
                except ValueError:
                    pass  # truncated flush: keep the previous checkpoint
            print(line, flush=True)
    except Exception:  # noqa: BLE001 -- reader must never lose the tail
        _kill()
    proc.wait()
    timer.cancel()
    if last_json is not None:
        # Guarantee the tail line is a complete record even if the child was
        # killed mid-flush.
        print(last_json, flush=True)
    else:
        print(
            json.dumps(
                {
                    "metric": "gated-turbo 4K throughput",
                    "value": 0.0,
                    "unit": "x-target",
                    "vs_baseline": 0.0,
                    "vs_baseline_turbo_modes": 0.0,
                    "error": (
                        "measurement child produced no record "
                        f"(rc={proc.returncode})"
                    ),
                }
            ),
            flush=True,
        )
    sys.exit(0)


def main() -> None:
    rec = _Record()

    def _emit_and_exit(signum=None, frame=None):  # noqa: ARG001
        rec.note(f"terminated by signal {signum}" if signum else "deadline")
        rec.emit()
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    def _watchdog():
        # Emits the record and hard-exits at the deadline when the GIL is
        # free; the GIL-holding-wedge case is bounded by the parent
        # supervisor instead (_supervisor_main).
        while True:
            rem = _remaining()
            if rec.done:
                return
            if rem <= 8.0:
                break
            time.sleep(min(rem - 8.0, 10.0))
        if not rec.done:
            rec.note("deadline watchdog fired")
            rec.emit()
            sys.stdout.flush()
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()
    rec.emit()  # initial checkpoint: even a pre-probe kill leaves a record

    phases = _Phases(rec)
    try:
        # Probe window scales with the budget: leave most of it for
        # measurement; a short budget still gets a real probe.
        if SMOKE:
            ok, attempts, err = True, 0, ""
        else:
            window = max(60.0, min(0.35 * _remaining(), 600.0))
            ok, attempts, err = _probe_backend(window_s=window)
        with rec.lock:
            rec.out["backend_probe_attempts"] = attempts
        if not ok:
            with rec.lock:
                rec.out["error"] = f"backend never came up: {err}"
            return
        _measure(rec, phases)
    except Exception as e:  # noqa: BLE001 -- the record must still emit
        with rec.lock:
            rec.out["error"] = f"{type(e).__name__}: {e}"[:400]
            rec.out["degraded"] = True
    finally:
        rec.done = True
        rec.emit()


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        main()
    else:
        _supervisor_main()
