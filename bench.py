"""Benchmark: exact Pallas kernels with full reference parameters on the
attached TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Targets (BASELINE.json): bilateral >= 5000 Mpix/s, NLM >= 500 Mpix/s per v5e
chip at 4K; >= 59 dB PSNR parity vs the CPU bilateral reference. vs_baseline is
the geometric mean of the two throughput ratios (1.0 == both targets met).

Timing methodology: host fences through a tunneled backend cost ~30 ms each,
so we chain K kernel applications inside one jitted fori_loop (data-dependent)
and report the K=1 -> K=4 slope, which cancels the per-call roundtrip.
"""

from __future__ import annotations

import json
import math
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_denoising_filter_tpu.utils import compile_cache

    compile_cache.enable()

    from image_denoising_filter_tpu.config import (
        BilateralParams,
        CpuBilateralParams,
        NlmParams,
        TilingConfig,
    )
    from image_denoising_filter_tpu.ops import bilateral, nlm_accumulate, normalize
    from image_denoising_filter_tpu.ops import reference as ref

    h, w = 2160, 3840  # 4K
    rng = np.random.default_rng(0)
    img_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img2_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    # Representative frames: opaque alpha (every LDR render), which enables
    # the exact uniform-alpha fast path that Session auto-selects.
    img_h[..., 3] = 1.0
    img2_h[..., 3] = 1.0
    img = jax.device_put(img_h)
    img2 = jax.device_put(img2_h)

    bp = BilateralParams(uniform_alpha=True)  # radius 20 (reference GPU params)
    nlp = NlmParams(uniform_alpha=True)  # s=7 p=3 h=0.5

    def slope_time(chain_fn, x0, *extra, iters=3, k=4):
        def run_k(kk):
            @jax.jit
            def f(x, *e):
                out = jax.lax.fori_loop(0, kk, lambda i, v: chain_fn(v, *e), x)
                return jnp.sum(out[0, 0])

            float(f(x0, *extra))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(iters):
                float(f(x0, *extra))
            return (time.perf_counter() - t0) / iters

        t1, tk = run_k(1), run_k(k)
        return max((tk - t1) / (k - 1), 1e-9)

    dt_b = slope_time(lambda x: bilateral(x, bp), img)
    dt_n = slope_time(lambda nb, tgt: nlm_accumulate(tgt, nb, nlp)[0], img2, img)
    mpix_b = h * w / dt_b / 1e6
    mpix_n = h * w / dt_n / 1e6

    # First-class quality-gated approximate modes (opt-in via --turbo):
    # per-channel bilateral grid (fused Pallas pool/build/slice pipeline,
    # bf16 grid + MXU banded-matmul blurs) and stride-2 compensated NLM
    # search with bf16 tap planes; see docs/PERFORMANCE.md, tests/test_fast.py.
    from image_denoising_filter_tpu.ops import bilateral_fast

    # Sub-10 ms pipelines: long chains keep the slope well above the
    # tunneled-backend noise floor (each fence costs ~30 ms with several ms
    # of jitter; a k-chain divides that jitter by k-1).
    dt_t = slope_time(lambda x: bilateral_fast(x, bp, 8, 2), img, k=12)
    mpix_t = h * w / dt_t / 1e6
    dt_t4 = slope_time(lambda x: bilateral_fast(x, bp, 8, 4), img, k=24)
    mpix_t4 = h * w / dt_t4 / 1e6

    nlp_t = NlmParams(uniform_alpha=True, search_stride=2)
    bf16 = TilingConfig(compute_dtype="bfloat16")
    dt_nt = slope_time(
        lambda nb, tgt: nlm_accumulate(tgt, nb, nlp_t, bf16)[0], img2, img, k=10
    )
    mpix_nt = h * w / dt_nt / 1e6

    # In-bench quality gates for the turbo rows: dB vs the exact kernels on
    # noisy structured content (the content class turbo targets). A mode
    # that regressed below its gate would be reported at 0 contribution.
    yy, xx = np.mgrid[0:512, 0:1024].astype(np.float32)
    clean = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            0.5 + 0.4 * np.cos(xx / 53.0 + yy / 31.0),
            0.5 + 0.3 * np.sin((xx + yy) / 41.0),
            np.ones_like(xx),
        ],
        axis=-1,
    ).astype(np.float32)
    nz = (clean + rng.normal(0, 0.05, clean.shape)).astype(np.float32)
    nz[..., 3] = 1.0
    nz2 = (clean + rng.normal(0, 0.05, clean.shape)).astype(np.float32)
    nz2[..., 3] = 1.0
    nz_d, nz2_d = jax.device_put(nz), jax.device_put(nz2)
    exact_b = np.asarray(bilateral(nz_d, bp))
    db_t = ref.psnr(
        np.asarray(bilateral_fast(nz_d, bp, 8, 2))[..., :3], exact_b[..., :3]
    )
    db_t4 = ref.psnr(
        np.asarray(bilateral_fast(nz_d, bp, 8, 4))[..., :3], exact_b[..., :3]
    )
    exact_n = np.asarray(normalize(*nlm_accumulate(nz_d, nz2_d, nlp)))
    db_nt = ref.psnr(
        np.asarray(normalize(*nlm_accumulate(nz_d, nz2_d, nlp_t, bf16)))[..., :3],
        exact_n[..., :3],
    )
    GATE_DB = 40.0
    if db_t < GATE_DB:
        mpix_t = 0.0
    if db_t4 < GATE_DB:
        mpix_t4 = 0.0
    if db_nt < GATE_DB:
        mpix_nt = 0.0

    # PSNR parity: our kernel in CPU-reference-params mode vs the CPU oracle
    # (interior only -- the CPU path zeroes a radius-wide border,
    # src/main.cpp:1823-1828).
    cp = CpuBilateralParams()
    small = np.asarray(rng.uniform(0, 1, (96, 128, 4)), np.float32)
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
    # Same geomean over the quality-gated (>= 40 dB vs exact, measured above)
    # approximate modes, using the fastest gated bilateral-grid setting. The
    # targets are reachable only by approximation: the measured elementwise
    # ceiling of the chip caps any EXACT 1681-tap bilateral at ~128 Mpix/s
    # and exact NLM at ~220 (docs/PERFORMANCE.md); both exact kernels run at
    # >80% of those ceilings.
    best_turbo_b = max(mpix_t, mpix_t4)
    vs_baseline_turbo = math.sqrt((best_turbo_b / 5000.0) * (mpix_nt / 500.0))

    print(
        json.dumps(
            {
                "metric": "4K exact-kernel throughput, geomean of bilateral/5Gpix + NLM/0.5Gpix targets",
                "value": round(vs_baseline, 4),
                "unit": "x-target",
                "vs_baseline": round(vs_baseline, 4),
                "bilateral_4k_mpix_s": round(mpix_b, 1),
                "nlm_4k_mpix_s": round(mpix_n, 1),
                "turbo_d2_4k_mpix_s": round(mpix_t, 1),
                "turbo_d4_4k_mpix_s": round(mpix_t4, 1),
                "nlm_turbo_4k_mpix_s": round(mpix_nt, 1),
                "turbo_d2_db_vs_exact": round(db_t, 1),
                "turbo_d4_db_vs_exact": round(db_t4, 1),
                "nlm_turbo_db_vs_exact": round(db_nt, 1),
                "vs_baseline_turbo_modes": round(vs_baseline_turbo, 4),
                "psnr_parity_db": round(psnr, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
