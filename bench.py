"""Benchmark: Pallas kernels with full reference parameters on the attached
TPU chip. ALWAYS prints exactly ONE JSON line (even when the backend never
comes up -- then with an "error" field and vs_baseline 0.0):
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Targets (BASELINE.json): bilateral >= 5000 Mpix/s, NLM >= 500 Mpix/s per v5e
chip at 4K; >= 59 dB PSNR parity vs the CPU bilateral reference. vs_baseline
is the geometric mean of the two throughput ratios (1.0 == both targets met).

Resilience (round-3 VERDICT #1): the tunneled axon backend wedges for long
stretches (compile plane AND data plane -- see CLAUDE.md), and round 3's
driver capture was lost to exactly that (BENCH_r03.json rc=1). So before any
measurement this script probes BOTH planes in a SUBPROCESS (a wedged
device_put hangs indefinitely; the subprocess bounds it) and retries with
backoff for a bounded window; every measurement phase is individually fenced
so one failure degrades the record instead of blanking it, and the JSON line
is emitted from a finally block no matter what.

Timing: the shared K-chain slope (utils/chiptime.py, ks up to 64, refeed mode
so every chained application sees the ORIGINAL content -- required since the
turbo slice kernel culls intensity levels per tile and would otherwise be
measured on progressively smoothed frames). Every throughput row publishes
its fit spread as `<row>_spread` (relative rms residual of the per-k medians
around the fit; docs/PERFORMANCE.md gives the quotability rule).

Content: the turbo modes are measured on BOTH content classes and both are
published: `render` (synthetic render-like scene + noise -- the reference's
actual workload class, where per-tile level culling engages) and `noise`
(full-range iid uniform noise -- the data-independent worst case; no tile can
cull). The headline turbo geomean uses the render-content numbers; the noise
floor is the *_noise field of each row.

Quality gates: every approximate (turbo) setting -- bilateral grid, NLM
strided search, guided-layers grid -- is gated at 40 dB vs the exact kernels
at BOTH the 512x1024 sinusoid content and the SHIPPING 4K tile configuration
on render content, through the same Pallas paths the throughput rows run
(round-3 VERDICT #3/#4). Gate-failing rows publish raw throughput with
gate_ok=false and are excluded from the geomean.

Exact-kernel regression checks: all five kernel families (bilateral, NLM,
layers, normalize -- the linear-layout variant rides the same check) compile
on the chip and PSNR-check against their NumPy oracles at 96x128, AND against
the XLA variants at a 1080p-scale shape (so a tile/halo/clamp bug at real
shapes fails the record -- round-3 VERDICT #7); any failure lands in
"exact_check_failures" and zeroes vs_baseline.
"""

from __future__ import annotations

import json
import math
import subprocess
import sys
import time

import numpy as np

GATE_DB = 40.0

# Bilateral-grid settings shipped through --turbo D (ops/fast.py); K is the
# Session.run_turbo(levels=) knob. K=6 == K=8 quality (25% faster); K=5
# measures IDENTICAL dB to K=6 at every d on both gate contents
# (tools/quality_ladders_r3.py) and is the round-4 shipping default at
# d=2/d=4: +10-16% at d=4 in both round-4 full-bench captures, +11-13% at
# d=2 in the interleaved A/B (tools/k_ab_d2_r4.py -- d=2 K=5 crossed the
# round-3 VERDICT's 2,400 Mpix/s mark at 2,415/2,461 render/noise). K=6
# rows stay for cross-round comparability.
TURBO_SETTINGS = ((2, 6), (2, 5), (4, 6), (4, 5), (8, 6))  # (d, levels)
# NLM turbo settings: (search_radius, search_stride, search_disk,
# weights_halfres). (7, 2) is the default (49 of 196 candidates); (6, 2)
# trims to 36 -- 41.0 dB vs exact on the gate content; (7, 2, disk) trims to
# 37 with the corners dropped instead of the radius -- 41.6/41.8 dB on the
# two gate contents in the round-4 CPU screen (stride 3 and s=5 fail the
# gate; docs/PERFORMANCE.md negative results). The best GATED row carries
# the geomean. (6, 2, disk) keeps just 27 candidates and still passed the
# CPU screen at 40.5 dB -- thin margin, so it rides as a row that only
# carries the geomean if it gates at 4K on-chip. The hrw rows compute the
# WEIGHT field at half row resolution (value taps full-res): ~14 vs ~22 VPU
# ops/candidate, 42.6 / 41.5 dB (disk) on the sinusoid gate content --
# content-dependent on hard row edges, so the 4K render gate is load-bearing.
NLM_TURBO_SETTINGS = (
    (7, 2, False, False),
    (6, 2, False, False),
    (7, 2, True, False),
    (6, 2, True, False),
    (7, 2, False, True),
    (7, 2, True, True),
)
# Guided-layers turbo downsamples (per-layer unit of the layers battery
# config, /root/reference/src/main.cpp:1957; round-3 VERDICT #3).
LAYERS_TURBO_DS = (2, 4)

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


class _Phases:
    """Run measurement phases with individual failure fencing: a phase that
    raises records its error and -- if a quick re-probe says the backend is
    gone -- stops launching further phases, so the JSON still carries every
    row measured before the failure."""

    def __init__(self, out: dict):
        self.out = out
        self.dead = False

    def run(self, name: str, fn) -> bool:
        if self.dead:
            self.out.setdefault("phase_errors", []).append(
                f"{name}: skipped (backend down)"
            )
            return False
        try:
            fn()
            return True
        except Exception as e:  # noqa: BLE001 -- record, degrade, continue
            msg = f"{type(e).__name__}: {e}"
            self.out.setdefault("phase_errors", []).append(
                f"{name}: {msg[:300]}"
            )
            ok, _, _ = _probe_backend(window_s=240.0, attempt_timeout=180.0)
            if not ok:
                self.dead = True
            return False


def _measure(out: dict) -> None:
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
        nlm_xla,
        normalize,
        normalize_layers_fast,
    )
    from image_denoising_filter_tpu.ops import reference as ref
    from image_denoising_filter_tpu.utils.content import synthetic_render

    h, w = 2160, 3840  # 4K
    n_px = h * w
    rng = np.random.default_rng(0)
    # Representative frames: opaque alpha (every LDR render), which enables
    # the exact uniform-alpha fast path that Session auto-selects.
    noise_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise_h[..., 3] = 1.0
    noise2_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise2_h[..., 3] = 1.0
    render_clean_h = synthetic_render(h, w, seed=1)
    render_h = (
        render_clean_h + rng.normal(0, 0.05, render_clean_h.shape)
    ).astype(np.float32)
    render_h[..., 3] = 1.0
    render2_h = (
        render_clean_h + rng.normal(0, 0.05, render_clean_h.shape)
    ).astype(np.float32)
    render2_h[..., 3] = 1.0
    noise = jax.device_put(noise_h)
    noise2 = jax.device_put(noise2_h)
    render = jax.device_put(render_h)
    render2 = jax.device_put(render2_h)

    bp = BilateralParams(uniform_alpha=True)  # radius 20 (reference GPU params)
    nlp = NlmParams(uniform_alpha=True)  # s=7 p=3 h=0.5
    bf16 = TilingConfig(compute_dtype="bfloat16")
    phases = _Phases(out)

    def put(key: str, value, nd: int = 1) -> None:
        out[key] = round(float(value), nd) if nd is not None else value

    def put_fit(key: str, mpix: float, fit) -> None:
        put(f"{key}_mpix_s", mpix)
        out[f"{key}_spread"] = round(float(fit.spread), 3)

    # --- exact kernels at 4K (content-independent cost; measured on noise) --
    def phase_exact_4k():
        fit_b = chiptime.slope_time(
            lambda x: bilateral(x, bp), noise, ks=(1, 2, 4)
        )
        put_fit("bilateral_4k", fit_b.mpix_s(n_px), fit_b)
        fit_n = chiptime.slope_time(
            lambda nb: nlm_accumulate(noise, nb, nlp)[0], noise2, ks=(1, 2, 4)
        )
        put_fit("nlm_4k", fit_n.mpix_s(n_px), fit_n)

    phases.run("exact_4k", phase_exact_4k)

    # --- exact kernels at 1080p (BASELINE.md names 1080p explicitly) --------
    def phase_exact_1080p():
        hh, ww = 1080, 1920
        na = jax.device_put(np.ascontiguousarray(noise_h[:hh, :ww]))
        nb = jax.device_put(np.ascontiguousarray(noise2_h[:hh, :ww]))
        fit_b = chiptime.slope_time(lambda x: bilateral(x, bp), na, ks=(1, 4, 8))
        put_fit("bilateral_1080p", fit_b.mpix_s(hh * ww), fit_b)
        fit_n = chiptime.slope_time(
            lambda y: nlm_accumulate(na, y, nlp)[0], nb, ks=(1, 4, 8)
        )
        put_fit("nlm_1080p", fit_n.mpix_s(hh * ww), fit_n)

    phases.run("exact_1080p", phase_exact_1080p)

    # --- quality-gated approximate (turbo) bilateral ------------------------
    turbo: dict = {}
    gates: dict = {}
    gate_ok: dict = {}

    def phase_turbo_bilateral():
        for content_name, img in (("render", render), ("noise", noise)):
            for d, K in TURBO_SETTINGS:
                # Chain length scales with speed: the sub-1 ms d=8 pipeline
                # needs k up to 64 to pull its slope off the method's
                # resolution floor (k is a dynamic arg: no extra compiles).
                ks = (
                    (1, 16, 64)
                    if d >= 8
                    else (1, 8, 32) if d > 2 else (1, 4, 16)
                )
                mpix, fit = chiptime.measure_mpix(
                    lambda x, K=K, d=d: bilateral_fast(x, bp, K, d),
                    img,
                    n_pixels=n_px,
                    ks=ks,
                )
                turbo[(content_name, d, K)] = (mpix, fit)

    phases.run("turbo_bilateral", phase_turbo_bilateral)

    # --- turbo NLM (strided search + bf16 taps) ------------------------------
    nlm_turbo: dict = {}

    def phase_turbo_nlm():
        # Per-setting fencing: one setting's compile failure (run-1 lost the
        # hrw rows to a Mosaic error) records its error and lets the sibling
        # rows still land; a genuinely dead backend fails the phase via the
        # re-raised last error.
        last_err = None
        for s_r, st, disk, hrw in NLM_TURBO_SETTINGS:
            nlp_t = NlmParams(
                uniform_alpha=True,
                search_radius=s_r,
                search_stride=st,
                search_disk=disk,
                weights_halfres=hrw,
            )
            try:
                mpix, fit = chiptime.measure_mpix(
                    lambda nb, p=nlp_t: nlm_accumulate(noise, nb, p, bf16)[0],
                    noise2,
                    n_pixels=n_px,
                    ks=(1, 4, 10),
                )
                nlm_turbo[(s_r, st, disk, hrw)] = (mpix, fit)
            except Exception as e:  # noqa: BLE001
                last_err = e
                out.setdefault("phase_errors", []).append(
                    f"turbo_nlm[{s_r},{st},{int(disk)},{int(hrw)}]: "
                    f"{type(e).__name__}: {e}"[:300]
                )
        if last_err is not None and not nlm_turbo:
            raise last_err

    phases.run("turbo_nlm", phase_turbo_nlm)

    # --- turbo guided layers (per-layer unit of the layers battery config) --
    layer_clean_h = synthetic_render(h, w, seed=2)  # G-buffer-like guide
    layer_clean_h[..., 3] = 1.0
    lp = LayersParams()
    layers_turbo: dict = {}

    def phase_turbo_layers():
        l_dev = jax.device_put(layer_clean_h)
        for d in LAYERS_TURBO_DS:
            fn = lambda t, d=d: normalize_layers_fast(  # noqa: E731
                *cross_bilateral_layers_fast(t, l_dev, lp, 6, d)
            )
            ks = (1, 4, 16) if d <= 2 else (1, 8, 32)
            for content_name, img in (("render", render), ("noise", noise)):
                mpix, fit = chiptime.measure_mpix(
                    fn, img, n_pixels=n_px, ks=ks
                )
                layers_turbo[(content_name, d)] = (mpix, fit)

    phases.run("turbo_layers", phase_turbo_layers)

    # --- quality gates -------------------------------------------------------
    # (a) 512x1024 structured sinusoids (the round-1/2 gate content);
    # (b) the SHIPPING 4K tile configuration on render content, so a
    #     tile-clamp bug at 4K zeroes the contribution -- for ALL THREE turbo
    #     families (bilateral round-2 VERDICT #6; NLM + layers round-3 #3/#4).
    yy, xx = np.mgrid[0:512, 0:1024].astype(np.float32)
    clean_s = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            0.5 + 0.4 * np.cos(xx / 53.0 + yy / 31.0),
            0.5 + 0.3 * np.sin((xx + yy) / 41.0),
            np.ones_like(xx),
        ],
        axis=-1,
    ).astype(np.float32)
    nz = (clean_s + rng.normal(0, 0.05, clean_s.shape)).astype(np.float32)
    nz[..., 3] = 1.0
    nz2 = (clean_s + rng.normal(0, 0.05, clean_s.shape)).astype(np.float32)
    nz2[..., 3] = 1.0

    def phase_gates_bilateral():
        nz_d = jax.device_put(nz)
        exact_small = np.asarray(bilateral(nz_d, bp))[..., :3]
        exact_4k = np.asarray(bilateral(render, bp))[..., :3]
        for d, K in TURBO_SETTINGS:
            db_small = ref.psnr(
                np.asarray(bilateral_fast(nz_d, bp, K, d))[..., :3],
                exact_small,
            )
            db_4k = ref.psnr(
                np.asarray(bilateral_fast(render, bp, K, d))[..., :3],
                exact_4k,
            )
            gates[(d, K)] = (db_small, db_4k)
            gate_ok[(d, K)] = min(db_small, db_4k) >= GATE_DB

    phases.run("gates_bilateral", phase_gates_bilateral)

    nlm_gates: dict = {}
    nlm_gate_ok: dict = {}

    def phase_gates_nlm():
        nz_d, nz2_d = jax.device_put(nz), jax.device_put(nz2)
        exact_small = np.asarray(normalize(*nlm_accumulate(nz_d, nz2_d, nlp)))
        # 4K gate through the SHIPPING Pallas tile path on render content
        # (exact 4K NLM is one sub-second launch; round-3 VERDICT #4).
        exact_4k = np.asarray(
            normalize(*nlm_accumulate(render, render2, nlp))
        )
        last_err = None
        for s_r, st, disk, hrw in NLM_TURBO_SETTINGS:
            nlp_g = NlmParams(
                uniform_alpha=True,
                search_radius=s_r,
                search_stride=st,
                search_disk=disk,
                weights_halfres=hrw,
            )
            try:
                db_small = ref.psnr(
                    np.asarray(
                        normalize(*nlm_accumulate(nz_d, nz2_d, nlp_g, bf16))
                    )[..., :3],
                    exact_small[..., :3],
                )
                db_4k = ref.psnr(
                    np.asarray(
                        normalize(*nlm_accumulate(render, render2, nlp_g, bf16))
                    )[..., :3],
                    exact_4k[..., :3],
                )
            except Exception as e:  # noqa: BLE001
                last_err = e
                out.setdefault("phase_errors", []).append(
                    f"gates_nlm[{s_r},{st},{int(disk)},{int(hrw)}]: "
                    f"{type(e).__name__}: {e}"[:300]
                )
                continue
            nlm_gates[(s_r, st, disk, hrw)] = (db_small, db_4k)
            nlm_gate_ok[(s_r, st, disk, hrw)] = min(db_small, db_4k) >= GATE_DB
        if last_err is not None and not nlm_gates:
            raise last_err

    phases.run("gates_nlm", phase_gates_nlm)

    layers_gates: dict = {}
    layers_gate_ok: dict = {}

    def phase_gates_layers():
        # Sinusoid gate: guide = clean sinusoids, target = noisy realization.
        nz_d = jax.device_put(nz)
        guide_s = jax.device_put(clean_s)
        exact_small = np.asarray(
            normalize(*cross_bilateral_layers(nz_d, guide_s, lp))
        )[..., :3]
        # 4K gate: the layers battery unit on render content (clean guide).
        l_dev = jax.device_put(layer_clean_h)
        exact_4k = np.asarray(
            normalize(*cross_bilateral_layers(render, l_dev, lp))
        )[..., :3]
        for d in LAYERS_TURBO_DS:
            got_small = np.asarray(
                normalize_layers_fast(
                    *cross_bilateral_layers_fast(nz_d, guide_s, lp, 6, d)
                )
            )[..., :3]
            got_4k = np.asarray(
                normalize_layers_fast(
                    *cross_bilateral_layers_fast(render, l_dev, lp, 6, d)
                )
            )[..., :3]
            db_small = ref.psnr(got_small, exact_small)
            db_4k = ref.psnr(got_4k, exact_4k)
            layers_gates[d] = (db_small, db_4k)
            layers_gate_ok[d] = min(db_small, db_4k) >= GATE_DB

    phases.run("gates_layers", phase_gates_layers)

    # --- exact-family regression checks on the chip --------------------------
    failures: list[str] = []

    def phase_exact_checks_oracle():
        # (a) 96x128 vs the NumPy oracles (catches Mosaic math regressions).
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
                failures.append(f"{name}:{db:.1f}dB")

    phases.run("exact_checks_oracle", phase_exact_checks_oracle)

    def phase_exact_checks_1080p():
        # (b) 1080p-scale Pallas vs the XLA variants (same exact math through
        # an independent lowering; both already compile on the chip) so a
        # tile/halo/clamp bug at real shapes fails the record (VERDICT #7).
        # The 96x128 oracle checks above cannot see 4K-scale tiling bugs.
        hh, ww = 1080, 1920
        ra = jax.device_put(np.ascontiguousarray(render_h[:hh, :ww]))
        rb = jax.device_put(np.ascontiguousarray(render2_h[:hh, :ww]))
        checks = {}
        checks["bilateral_1080p"] = ref.psnr(
            np.asarray(bilateral(ra, bp)), np.asarray(bilateral_xla(ra, bp))
        )
        wc_k, nw_k = nlm_accumulate(ra, rb, nlp)
        wc_x, nw_x = nlm_xla(ra, rb, nlp)
        checks["nlm_1080p"] = ref.psnr(
            np.asarray(normalize(wc_k, nw_k)),
            np.asarray(normalize(wc_x, nw_x)),
        )
        lwc_k, lnw_k = cross_bilateral_layers(ra, rb, lp)
        lwc_x, lnw_x = cross_bilateral_layers_xla(ra, rb, lp)
        checks["layers_1080p"] = ref.psnr(
            np.asarray(normalize(lwc_k, lnw_k)),
            np.asarray(normalize(lwc_x, lnw_x)),
        )
        for name, db in checks.items():
            if not (db >= 80.0):
                failures.append(f"{name}:{db:.1f}dB")

    phases.run("exact_checks_1080p", phase_exact_checks_1080p)

    # --- PSNR parity vs the CPU bilateral reference ---------------------------
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

    phases.run("parity", phase_parity)

    # --- assemble the record --------------------------------------------------
    for d, K in TURBO_SETTINGS:
        # K=6 keeps the round-2/3 field names; other K get a k suffix.
        tag = f"turbo_d{d}" if K == 6 else f"turbo_d{d}k{K}"
        if ("render", d, K) in turbo and ("noise", d, K) in turbo:
            mpix_r, fit_r = turbo[("render", d, K)]
            mpix_n_, fit_n_ = turbo[("noise", d, K)]
            put(f"{tag}_4k_mpix_s", mpix_r)
            out[f"{tag}_4k_spread"] = round(float(fit_r.spread), 3)
            put(f"{tag}_4k_mpix_s_noise", mpix_n_)
            out[f"{tag}_4k_spread_noise"] = round(float(fit_n_.spread), 3)
        if (d, K) in gates:
            put(f"{tag}_db_vs_exact", gates[(d, K)][0])
            put(f"{tag}_db_vs_exact_4k", gates[(d, K)][1])
            out[f"{tag}_gate_ok"] = bool(gate_ok.get((d, K), False))

    # Row tags: (7,2) keeps the round-2/3 field names; trims get a suffix.
    headline_key = (7, 2, False, False)
    nlm_tags = {
        headline_key: "nlm_turbo",
        (6, 2, False, False): "nlm_turbo_s6",
        (7, 2, True, False): "nlm_turbo_disk",
        (6, 2, True, False): "nlm_turbo_s6disk",
        (7, 2, False, True): "nlm_turbo_hrw",
        (7, 2, True, True): "nlm_turbo_hrwdisk",
    }
    for key, tag in nlm_tags.items():
        if key in nlm_turbo:
            mpix_nt, fit_nt = nlm_turbo[key]
            if key == headline_key:
                # Historical field semantics: the headline row zeroes its
                # published throughput when it fails its gate.
                mpix_nt = mpix_nt if nlm_gate_ok.get(key, False) else 0.0
            put(f"{tag}_4k_mpix_s", mpix_nt)
            out[f"{tag}_4k_spread"] = round(float(fit_nt.spread), 3)
        if key in nlm_gates:
            put(f"{tag}_db_vs_exact", nlm_gates[key][0])
            put(f"{tag}_db_vs_exact_4k", nlm_gates[key][1])
            if key != headline_key:
                out[f"{tag}_gate_ok"] = bool(nlm_gate_ok.get(key, False))

    for d in LAYERS_TURBO_DS:
        tag = f"layers_turbo_d{d}"
        if ("render", d) in layers_turbo and ("noise", d) in layers_turbo:
            mpix_r, fit_r = layers_turbo[("render", d)]
            mpix_n_, fit_n_ = layers_turbo[("noise", d)]
            put(f"{tag}_mpix_s", mpix_r)
            out[f"{tag}_spread"] = round(float(fit_r.spread), 3)
            put(f"{tag}_mpix_s_noise", mpix_n_)
        if d in layers_gates:
            put(f"{tag}_db_vs_exact", layers_gates[d][0])
            put(f"{tag}_db_vs_exact_4k", layers_gates[d][1])
            out[f"{tag}_gate_ok"] = bool(layers_gate_ok.get(d, False))
        if not layers_gate_ok.get(d, False):
            # Gate-failing (or unmeasured) layers rows zero their published
            # throughput so a layers regression is visible in the record.
            out[f"{tag}_mpix_s"] = 0.0

    # Headline geomeans. The targets are reachable only by approximation: the
    # measured elementwise ceiling of the chip caps any EXACT 1681-tap
    # bilateral at ~128 Mpix/s and exact NLM at ~220 (docs/PERFORMANCE.md);
    # both exact kernels run at >80% of those ceilings. Only gate-passing
    # settings carry the geomean; gate-failing throughput is still published
    # (with measured dB and gate_ok=false) rather than silently zeroed.
    mpix_b = out.get("bilateral_4k_mpix_s", 0.0)
    mpix_n = out.get("nlm_4k_mpix_s", 0.0)
    vs_baseline = math.sqrt((mpix_b / 5000.0) * (mpix_n / 500.0))
    gated = [k for k in TURBO_SETTINGS if gate_ok.get(k, False)]
    best_turbo_render = max(
        (turbo[("render", d, K)][0] for d, K in gated if ("render", d, K) in turbo),
        default=0.0,
    )
    best_turbo_noise = max(
        (turbo[("noise", d, K)][0] for d, K in gated if ("noise", d, K) in turbo),
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
    if "phase_errors" in out:
        out["degraded"] = True


def main() -> None:
    out: dict = {
        "metric": (
            "4K exact-kernel throughput, geomean of bilateral/5Gpix + "
            "NLM/0.5Gpix targets"
        ),
        "value": 0.0,
        "unit": "x-target",
        "vs_baseline": 0.0,
    }
    try:
        ok, attempts, err = _probe_backend(window_s=780.0)
        out["backend_probe_attempts"] = attempts
        if not ok:
            out["error"] = f"backend never came up: {err}"
            return
        _measure(out)
    except Exception as e:  # noqa: BLE001 -- the record must still emit
        out["error"] = f"{type(e).__name__}: {e}"[:400]
        out["degraded"] = True
    finally:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
