"""CPU quality screen: guided-layers turbo at K=5 vs K=6 (round 4).

K=5 measured identical to K=6 for the BILATERAL family at every d (round 3)
and is 10-16% faster on chip at d=4 (the d=4 default since round 4); the
layers family's K=5 quality cell was unmeasured. This screens it on the
bench sinusoid gate content (512x1024, noisy target + clean guide) and a
540p render crop, vs the exact two-pass pipeline and vs K=6 directly.

Usage: JAX_PLATFORMS=cpu python tools/layers_k5_screen_r4.py
"""

from __future__ import annotations

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_denoising_filter_tpu.config import LayersParams
    from image_denoising_filter_tpu.ops import (
        cross_bilateral_layers,
        cross_bilateral_layers_fast,
        normalize,
        normalize_layers_fast,
    )
    from image_denoising_filter_tpu.ops import reference as ref
    from image_denoising_filter_tpu.utils.content import synthetic_render

    lp = LayersParams()
    rng = np.random.default_rng(0)

    # Bench sinusoid gate content (bench.py phase_gates_layers).
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

    render = synthetic_render(960, 544, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    guide_r = synthetic_render(960, 544, seed=1)
    guide_r[..., 3] = 1.0

    for name, tgt, guide in (
        ("sinusoid 512x1024", nz, clean_s),
        ("render 960x544", render, guide_r),
    ):
        t_d = jax.device_put(tgt)
        g_d = jax.device_put(guide)
        exact = np.asarray(normalize(*cross_bilateral_layers(t_d, g_d, lp)))[
            ..., :3
        ]
        for d in (2, 4):
            outs = {}
            for K in (6, 5):
                outs[K] = np.asarray(
                    normalize_layers_fast(
                        *cross_bilateral_layers_fast(t_d, g_d, lp, K, d)
                    )
                )[..., :3]
            db6 = ref.psnr(outs[6], exact)
            db5 = ref.psnr(outs[5], exact)
            db55 = ref.psnr(outs[5], outs[6])
            print(
                f"{name} d={d}: K=6 {db6:5.1f} dB vs exact | K=5 {db5:5.1f} dB"
                f" | K=5 vs K=6 {db55:5.1f} dB",
                flush=True,
            )


if __name__ == "__main__":
    main()
