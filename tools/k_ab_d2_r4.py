"""Interleaved chip A/B: turbo bilateral d=2 K=6 (default) vs K=5.

Round 3 measured K=5 quality IDENTICAL to K=6 at every d on both gate
contents (tools/quality_ladders_r3.py); both round-4 full-bench captures
measured K=5 10-16% faster at d=4 (now the d=4 default). This settles the
remaining cell: d=2 speed. Runs through the shared interleaved harness
(utils/chiptime.ab_compare -- round-4 drift lesson encoded once, round-4
VERDICT weak #7).

Usage: python tools/k_ab_d2_r4.py [rounds]   # chip-sequential: run alone
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    d = 2
    h, w = 2160, 3840
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

    for name, img in imgs.items():
        print(f"--- content: {name} ---", flush=True)
        chiptime.ab_compare(
            {
                "K6": lambda x: bilateral_fast(x, bp, 6, d),
                "K5": lambda x: bilateral_fast(x, bp, 5, d),
            },
            img,
            n_pixels=h * w,
            ks=(1, 4, 16),
            rounds=rounds,
        )


if __name__ == "__main__":
    main()
