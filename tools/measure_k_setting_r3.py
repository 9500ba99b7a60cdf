"""Measure a (downsample, levels) turbo setting exactly as bench.py would.

Prints throughput on render + noise content and BOTH quality gates
(512x1024 sinusoids and the 4K render content) vs the exact bilateral
kernel, so a candidate setting can be evaluated before it is added to
bench.py's TURBO_SETTINGS.

Usage: python tools/measure_k_setting_r3.py [d] [levels]
Chip-sequential: run alone.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import bilateral, bilateral_fast
    from image_denoising_filter_tpu.ops import reference as ref
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    noise = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise[..., 3] = 1.0
    render_d = jax.device_put(render)
    noise_d = jax.device_put(noise)
    bp = BilateralParams(uniform_alpha=True)

    for name, img in (("render", render_d), ("noise", noise_d)):
        mpix, fit = chiptime.measure_mpix(
            lambda x: bilateral_fast(x, bp, K, d),
            img,
            n_pixels=n_px,
            ks=(1, 8, 32) if d > 2 else (1, 4, 16),
        )
        print(
            f"d={d} K={K} {name}: {mpix:.0f} Mpix/s "
            f"({fit.slope * 1e3:.3f} ms, spread {fit.spread * 100:.1f}%)",
            flush=True,
        )

    # Gates (identical content/construction to bench.py).
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
    nz_d = jax.device_put(nz)
    exact_small = np.asarray(bilateral(nz_d, bp))[..., :3]
    exact_4k = np.asarray(bilateral(render_d, bp))[..., :3]
    db_small = ref.psnr(
        np.asarray(bilateral_fast(nz_d, bp, K, d))[..., :3], exact_small
    )
    db_4k = ref.psnr(
        np.asarray(bilateral_fast(render_d, bp, K, d))[..., :3], exact_4k
    )
    print(f"d={d} K={K} gates: {db_small:.2f} dB @512 sinusoid, "
          f"{db_4k:.2f} dB @4K render (gate 40.0)", flush=True)


if __name__ == "__main__":
    main()
