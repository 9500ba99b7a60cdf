"""Interleaved chip A/B: guided-layers turbo K=6 vs K=5 at d=2 and d=4.

Quality: K=5 screens identical to K=6 for the layers family too
(tools/layers_k5_screen_r4.py: within 0.1-0.3 dB vs exact on both gate
contents, ~60 dB K=5-vs-K=6 agreement). This measures the speed cell on
the shipping guided path (fused at d=2/d=4 since round 4), through the
shared interleaved harness (utils/chiptime.ab_compare).

Usage: python tools/layers_k_ab_r4.py [rounds]   # chip-sequential: run alone
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    guide = synthetic_render(h, w, seed=2)
    guide[..., 3] = 1.0
    t_dev = jax.device_put(render)
    g_dev = jax.device_put(guide)
    lp = LayersParams()

    for d in (2, 4):
        print(f"--- layers turbo d={d} ---", flush=True)

        def run(t, K, d=d):
            return normalize_layers_fast(
                *cross_bilateral_layers_fast(t, g_dev, lp, K, d)
            )

        chiptime.ab_compare(
            {
                "K6": lambda t: run(t, 6),
                "K5": lambda t: run(t, 5),
            },
            t_dev,
            n_pixels=h * w,
            ks=(1, 4, 16),
            rounds=rounds,
        )


if __name__ == "__main__":
    main()
