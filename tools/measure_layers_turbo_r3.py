"""Measure the TURBO guided-layers pipeline (one layer) on the chip at 4K.

One row per requested d (argv, default "2 4"): render-content throughput of
`cross_bilateral_layers_fast` + `normalize_layers_fast` (the per-layer unit
the battery dispatches per G-buffer layer, shaders/bialteral_layers.comp
analog), plus dB of the normalized turbo output vs the exact two-pass
pipeline on a 512x1024 crop (the full 4K exact layers run costs ~90 s/frame;
the crop matches the bench sinusoid-gate resolution).

Usage: python tools/measure_layers_turbo_r3.py [d ...]
Chip-sequential: run alone.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import LayersParams
    from image_denoising_filter_tpu.ops import (
        cross_bilateral_layers,
        normalize,
    )
    from image_denoising_filter_tpu.ops import reference as ref
    from image_denoising_filter_tpu.ops.fast import (
        cross_bilateral_layers_fast,
        normalize_layers_fast,
    )
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()

    ds = [int(a) for a in sys.argv[1:]] or [2, 4]
    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    target = synthetic_render(h, w, seed=1)
    target = (target + rng.normal(0, 0.05, target.shape)).astype(np.float32)
    target[..., 3] = 1.0
    layer = synthetic_render(h, w, seed=2)  # clean guide (G-buffer analog)
    layer[..., 3] = 1.0
    t_dev = jax.device_put(target)
    l_dev = jax.device_put(layer)
    lp = LayersParams()

    ch, cw = 512, 1024
    t_c = jax.device_put(np.ascontiguousarray(target[:ch, :cw]))
    l_c = jax.device_put(np.ascontiguousarray(layer[:ch, :cw]))
    exact_c = np.asarray(
        normalize(*cross_bilateral_layers(t_c, l_c, lp))
    )[..., :3]

    for d in ds:
        fn = lambda t, d=d: normalize_layers_fast(
            *cross_bilateral_layers_fast(t, l_dev, lp, 6, d)
        )
        ks = (1, 4, 16) if d <= 2 else (1, 8, 32)
        mpix, fit = chiptime.measure_mpix(fn, t_dev, n_pixels=n_px, ks=ks)
        got_c = np.asarray(
            normalize_layers_fast(
                *cross_bilateral_layers_fast(t_c, l_c, lp, 6, d)
            )
        )[..., :3]
        db = ref.psnr(got_c, exact_c)
        print(
            f"layers-turbo d={d}: {mpix:.0f} Mpix/s/layer "
            f"({fit.slope * 1e3:.3f} ms, spread {fit.spread * 100:.1f}%), "
            f"{db:.1f} dB vs exact two-pass @512x1024",
            flush=True,
        )


if __name__ == "__main__":
    main()
