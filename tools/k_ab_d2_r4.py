"""Interleaved chip A/B: turbo bilateral d=2 K=6 (default) vs K=5.

Round 3 measured K=5 quality IDENTICAL to K=6 at every d on both gate
contents (tools/quality_ladders_r3.py); both round-4 full-bench captures
measured K=5 10-16% faster at d=4 (now the d=4 default). This settles the
remaining cell: d=2 speed. Interleaved A/B/A/B reps per the round-4 lesson
(single-capture cross-program deltas under ~10% are inside session drift).

Usage: python tools/k_ab_d2_r4.py [reps]   # chip-sequential: run alone
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import bilateral_fast
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    d = 2
    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    noise = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise[..., 3] = 1.0
    imgs = {
        "render": jax.device_put(render),
        "noise": jax.device_put(noise),
    }
    bp = BilateralParams(uniform_alpha=True)

    results: dict[tuple[str, int], list[float]] = {}
    for rep in range(reps):
        for name, img in imgs.items():
            for K in (6, 5):  # interleave within the rep
                mpix, fit = chiptime.measure_mpix(
                    lambda x, K=K: bilateral_fast(x, bp, K, d),
                    img,
                    n_pixels=n_px,
                    ks=(1, 4, 16),
                )
                results.setdefault((name, K), []).append(mpix)
                print(
                    f"rep {rep} {name} K={K}: {mpix:7.0f} Mpix/s "
                    f"(spread {fit.spread * 100:.1f}%)",
                    flush=True,
                )
    for name in imgs:
        m6 = float(np.median(results[(name, 6)]))
        m5 = float(np.median(results[(name, 5)]))
        print(
            f"MEDIAN {name}: K=6 {m6:.0f} vs K=5 {m5:.0f} Mpix/s "
            f"({(m5 / m6 - 1) * 100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
