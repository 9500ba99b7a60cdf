"""Interleaved chip A/B: guided-layers turbo K=6 vs K=5 at d=2 and d=4.

Quality: K=5 screens identical to K=6 for the layers family too
(tools/layers_k5_screen_r4.py: within 0.1-0.3 dB vs exact on both gate
contents, ~60 dB K=5-vs-K=6 agreement). This measures the speed cell on
the shipping guided path (fused at d=2/d=4 since round 4). Interleaved
A/B/A/B reps per the round-4 drift lesson.

Usage: python tools/layers_k_ab_r4.py [reps]   # chip-sequential: run alone
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import LayersParams
    from image_denoising_filter_tpu.ops import (
        cross_bilateral_layers_fast,
        normalize_layers_fast,
    )
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    guide = synthetic_render(h, w, seed=2)
    guide[..., 3] = 1.0
    t_dev = jax.device_put(render)
    g_dev = jax.device_put(guide)
    lp = LayersParams()

    results: dict[tuple[int, int], list[float]] = {}
    for rep in range(reps):
        for d in (2, 4):
            for K in (6, 5):  # interleave within the rep
                fn = lambda t, K=K, d=d: normalize_layers_fast(  # noqa: E731
                    *cross_bilateral_layers_fast(t, g_dev, lp, K, d)
                )
                mpix, fit = chiptime.measure_mpix(
                    fn, t_dev, n_pixels=n_px, ks=(1, 4, 16)
                )
                results.setdefault((d, K), []).append(mpix)
                print(
                    f"rep {rep} d={d} K={K}: {mpix:7.0f} Mpix/s "
                    f"(spread {fit.spread * 100:.1f}%)",
                    flush=True,
                )
    for d in (2, 4):
        m6 = float(np.median(results[(d, 6)]))
        m5 = float(np.median(results[(d, 5)]))
        print(
            f"MEDIAN d={d}: K=6 {m6:.0f} vs K=5 {m5:.0f} Mpix/s "
            f"({(m5 / m6 - 1) * 100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
