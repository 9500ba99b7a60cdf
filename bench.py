"""Benchmark: Pallas kernels with full reference parameters on the attached
TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Targets (BASELINE.json): bilateral >= 5000 Mpix/s, NLM >= 500 Mpix/s per v5e
chip at 4K; >= 59 dB PSNR parity vs the CPU bilateral reference. vs_baseline
is the geometric mean of the two throughput ratios (1.0 == both targets met).

Timing: the shared K-chain slope (utils/chiptime.py, ks up to 32, refeed mode
so every chained application sees the ORIGINAL content -- required since the
turbo slice kernel culls intensity levels per tile and would otherwise be
measured on progressively smoothed frames).

Content: the turbo modes are measured on BOTH content classes and both are
published: `render` (synthetic render-like scene + noise -- the reference's
actual workload class, where per-tile level culling engages) and `noise`
(full-range iid uniform noise -- the data-independent worst case; no tile can
cull). The headline turbo geomean uses the render-content numbers; the noise
floor is the *_noise field of each row.

Exact-kernel regression checks: all five kernel families (bilateral, NLM,
layers, normalize -- the linear-layout variant rides the same check) compile
on the chip and PSNR-check against their NumPy oracles; any failure lands in
"exact_check_failures" and zeroes vs_baseline so a Mosaic regression cannot
hide (round-2 VERDICT #5).
"""

from __future__ import annotations

import json
import math

import numpy as np


def main() -> None:
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
        cross_bilateral_layers,
        nlm_accumulate,
        normalize,
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
    render_h = synthetic_render(h, w, seed=1)
    render_h = (render_h + rng.normal(0, 0.05, render_h.shape)).astype(
        np.float32
    )
    render_h[..., 3] = 1.0
    noise = jax.device_put(noise_h)
    noise2 = jax.device_put(noise2_h)
    render = jax.device_put(render_h)

    bp = BilateralParams(uniform_alpha=True)  # radius 20 (reference GPU params)
    nlp = NlmParams(uniform_alpha=True)  # s=7 p=3 h=0.5

    # --- exact kernels (content-independent cost; measured on noise) ---
    fit_b = chiptime.slope_time(lambda x: bilateral(x, bp), noise, ks=(1, 2, 4))
    fit_n = chiptime.slope_time(
        lambda nb: nlm_accumulate(noise, nb, nlp)[0], noise2, ks=(1, 2, 4)
    )
    mpix_b = fit_b.mpix_s(n_px)
    mpix_n = fit_n.mpix_s(n_px)

    # --- quality-gated approximate (turbo) modes ---
    # Bilateral-grid settings shipped through --turbo D (ops/fast.py); K is
    # the Session.run_turbo(levels=) knob. K=6 == K=8 quality (25% faster);
    # (4, 5) measures IDENTICAL dB to (4, 6) on both gate contents and ~5%
    # faster still -- published as its own gated row.
    TURBO_SETTINGS = ((2, 6), (4, 6), (4, 5), (8, 6))  # (downsample, levels)
    turbo = {}
    for content_name, img in (("render", render), ("noise", noise)):
        for d, K in TURBO_SETTINGS:
            # Chain length scales with speed: the sub-1 ms d=8 pipeline needs
            # k up to 64 to pull its slope off the method's resolution floor
            # (14% spread at k<=32 in the round-3 three-run table; k is a
            # dynamic arg so longer chains cost no extra compiles).
            ks = (1, 16, 64) if d >= 8 else (1, 8, 32) if d > 2 else (1, 4, 16)
            mpix, _fit = chiptime.measure_mpix(
                lambda x, K=K, d=d: bilateral_fast(x, bp, K, d),
                img,
                n_pixels=n_px,
                ks=ks,
            )
            turbo[(content_name, d, K)] = mpix

    # NLM turbo settings: (search_radius, search_stride). (7, 2) is the
    # default (49 of 196 candidates, the round-2 mode); (6, 2) trims the
    # search window to 36 candidates -- measured 41.0 dB vs exact on the gate
    # content (just above the 40 dB gate; stride 3 and s=5 fail it, see
    # docs/PERFORMANCE.md negative results). Both are published with their
    # measured dB; the best GATED row carries the geomean.
    NLM_TURBO_SETTINGS = ((7, 2), (6, 2))
    bf16 = TilingConfig(compute_dtype="bfloat16")
    nlm_turbo = {}
    for s_r, st in NLM_TURBO_SETTINGS:
        nlp_t = NlmParams(
            uniform_alpha=True, search_radius=s_r, search_stride=st
        )
        mpix, _ = chiptime.measure_mpix(
            lambda nb, p=nlp_t: nlm_accumulate(noise, nb, p, bf16)[0],
            noise2,
            n_pixels=n_px,
            ks=(1, 4, 10),
        )
        nlm_turbo[(s_r, st)] = mpix

    # --- quality gates ---
    # (a) 512x1024 structured sinusoids (the round-1/2 gate content);
    # (b) the SHIPPING 4K tile configuration on render content, so a
    #     tile-clamp bug at 4K zeroes the turbo contribution (VERDICT #6).
    GATE_DB = 40.0
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
    nz_d, nz2_d = jax.device_put(nz), jax.device_put(nz2)
    exact_small = np.asarray(bilateral(nz_d, bp))[..., :3]
    exact_4k = np.asarray(bilateral(render, bp))[..., :3]

    gates = {}
    gate_ok = {}
    for d, K in TURBO_SETTINGS:
        db_small = ref.psnr(
            np.asarray(bilateral_fast(nz_d, bp, K, d))[..., :3], exact_small
        )
        db_4k = ref.psnr(
            np.asarray(bilateral_fast(render, bp, K, d))[..., :3], exact_4k
        )
        gates[(d, K)] = (db_small, db_4k)
        gate_ok[(d, K)] = min(db_small, db_4k) >= GATE_DB

    exact_n_small = np.asarray(normalize(*nlm_accumulate(nz_d, nz2_d, nlp)))
    nlm_gates = {}
    nlm_gate_ok = {}
    for s_r, st in NLM_TURBO_SETTINGS:
        nlp_g = NlmParams(
            uniform_alpha=True, search_radius=s_r, search_stride=st
        )
        db = ref.psnr(
            np.asarray(normalize(*nlm_accumulate(nz_d, nz2_d, nlp_g, bf16)))[
                ..., :3
            ],
            exact_n_small[..., :3],
        )
        nlm_gates[(s_r, st)] = db
        nlm_gate_ok[(s_r, st)] = db >= GATE_DB
    db_nt = nlm_gates[(7, 2)]
    mpix_nt = nlm_turbo[(7, 2)] if nlm_gate_ok[(7, 2)] else 0.0
    # Best gated NLM turbo row carries the geomean (same rule as bilateral).
    best_nlm_turbo = max(
        (nlm_turbo[k] for k in NLM_TURBO_SETTINGS if nlm_gate_ok[k]),
        default=0.0,
    )

    # --- exact-family regression checks on the chip (vs NumPy oracles) ---
    failures = []
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
        np.asarray(normalize(wc_k, nw_k)), ref.normalize_reference(wc_o, nw_o)
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

    # PSNR parity: our kernel in CPU-reference-params mode vs the CPU oracle
    # (interior only -- the CPU path zeroes a radius-wide border,
    # src/main.cpp:1823-1828).
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
    psnr = ref.psnr(got[interior], want[interior])

    ratio_b = mpix_b / 5000.0
    ratio_n = mpix_n / 500.0
    vs_baseline = math.sqrt(ratio_b * ratio_n)
    # Gated turbo geomean on the representative (render) content; the
    # uniform-noise floors are published alongside. The targets are reachable
    # only by approximation: the measured elementwise ceiling of the chip
    # caps any EXACT 1681-tap bilateral at ~128 Mpix/s and exact NLM at ~220
    # (docs/PERFORMANCE.md); both exact kernels run at >80% of those
    # ceilings.
    # Only gate-passing settings may carry the headline geomean; the raw
    # throughput of gate-failing settings is still published (with its
    # measured dB and gate_ok=false) rather than silently zeroed.
    gated = [(d, K) for d, K in TURBO_SETTINGS if gate_ok[(d, K)]]
    best_turbo_render = max(
        (turbo[("render", d, K)] for d, K in gated), default=0.0
    )
    best_turbo_noise = max(
        (turbo[("noise", d, K)] for d, K in gated), default=0.0
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

    out = {
        "metric": "4K exact-kernel throughput, geomean of bilateral/5Gpix + NLM/0.5Gpix targets",
        "value": round(vs_baseline, 4),
        "unit": "x-target",
        "vs_baseline": round(vs_baseline, 4),
        "bilateral_4k_mpix_s": round(mpix_b, 1),
        "nlm_4k_mpix_s": round(mpix_n, 1),
        "nlm_turbo_4k_mpix_s": round(mpix_nt, 1),
        "nlm_turbo_db_vs_exact": round(db_nt, 1),
        "nlm_turbo_s6_4k_mpix_s": round(nlm_turbo[(6, 2)], 1),
        "nlm_turbo_s6_db_vs_exact": round(nlm_gates[(6, 2)], 1),
        "nlm_turbo_s6_gate_ok": nlm_gate_ok[(6, 2)],
        "vs_baseline_turbo_modes": round(vs_baseline_turbo, 4),
        "vs_baseline_turbo_modes_noise": round(vs_baseline_turbo_noise, 4),
        "psnr_parity_db": round(psnr, 1),
        "exact_check_failures": failures,
    }
    for d, K in TURBO_SETTINGS:
        # K=6 keeps the round-2/3 field names; other K get a k suffix.
        tag = f"turbo_d{d}" if K == 6 else f"turbo_d{d}k{K}"
        out[f"{tag}_4k_mpix_s"] = round(turbo[("render", d, K)], 1)
        out[f"{tag}_4k_mpix_s_noise"] = round(turbo[("noise", d, K)], 1)
        out[f"{tag}_db_vs_exact"] = round(gates[(d, K)][0], 1)
        out[f"{tag}_db_vs_exact_4k"] = round(gates[(d, K)][1], 1)
        out[f"{tag}_gate_ok"] = gate_ok[(d, K)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
