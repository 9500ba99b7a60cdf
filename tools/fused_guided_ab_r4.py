"""A/B the fused guided build+slice kernel vs the two-kernel guided grid
pipeline on the chip, same session (round 4; see
ops/fast.py:_fused_guided_pipeline_planar and tools/fused_ab_r4.py for the
bilateral analog).

What the fused kernel changes at 4K: no 7K-plane grid HBM round-trip (the
42-plane bf16 grid is the largest HBM object in the guided pipeline: ~174 MB
written + re-read at d=2), one pallas launch + its XLA glue instead of two,
and per-tile level culling also gates grid CONSTRUCTION (the standalone
guided build computes all K levels).

Equivalence is checked on-device per d (bf16-ulp-level on the partials).

Run on the chip: python tools/fused_guided_ab_r4.py [d ...]
Chip-sequential: run alone.
"""

from __future__ import annotations

import functools
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np

from image_denoising_filter_tpu.config import LayersParams
from image_denoising_filter_tpu.ops import fast
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render


@functools.partial(jax.jit, static_argnums=(2, 3))
def pipeline(target, layer, d: int, fused: bool):
    lp = LayersParams()
    return fast.normalize_layers_fast(
        *fast.cross_bilateral_layers_fast(target, layer, lp, 6, d, fused=fused)
    )


def main():
    compile_cache.enable()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    ds = [int(a) for a in args] or [2, 4]
    h, w = 2160, 3840
    smoke = bool(os.environ.get("FUSED_AB_SMOKE"))
    if smoke:
        h, w = 112, 384
    rng = np.random.default_rng(0)
    render_h = synthetic_render(h, w, seed=1)
    render_h = (render_h + rng.normal(0, 0.05, render_h.shape)).astype(
        np.float32
    )
    render_h[..., 3] = 1.0
    noise_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise_h[..., 3] = 1.0
    layer_h = synthetic_render(h, w, seed=2)  # G-buffer-like clean guide
    layer_h[..., 3] = 1.0
    render = jax.device_put(render_h)
    noise = jax.device_put(noise_h)
    layer = jax.device_put(layer_h)
    n_px = h * w

    for d in ds:
        if not smoke:
            ks = (1, 8, 32) if d > 2 else (1, 4, 16)
            for content_name, img in (("render", render), ("noise", noise)):
                for fused in (False, True):
                    mpix, fit = chiptime.measure_mpix(
                        lambda x, d=d, f=fused: pipeline(x, layer, d, f),
                        img,
                        n_pixels=n_px,
                        ks=ks,
                    )
                    print(
                        f"d={d} {content_name} fused={fused}: "
                        f"{mpix:.0f} Mpix/s (slope {fit.slope*1e3:.3f} ms, "
                        f"spread {fit.spread:.1%})",
                        flush=True,
                    )
        a = np.asarray(pipeline(render, layer, d, False))
        b = np.asarray(pipeline(render, layer, d, True))
        print(f"d={d} max|two-fused| render = {np.abs(a - b).max():.2e}")
        an = np.asarray(pipeline(noise, layer, d, False))
        bn = np.asarray(pipeline(noise, layer, d, True))
        print(f"d={d} max|two-fused| noise  = {np.abs(an - bn).max():.2e}")


if __name__ == "__main__":
    main()
