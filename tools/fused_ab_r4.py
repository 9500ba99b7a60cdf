"""A/B the fully-fused build+slice kernel vs the two-kernel grid pipeline
on the chip, same session (round-4; see ops/fast.py:_fused_grid_pipeline_planar).

What the fused kernel changes at 4K:
  * no grid HBM round-trip (d=2: ~74 MB write + ~90 MB slab re-read),
  * one pallas launch + its XLA glue instead of two,
  * per-tile level culling also skips grid CONSTRUCTION (the standalone
    build kernel always computes all K levels) AND the levels below the
    tile's guide range (telescoped sum rebased at g_{floor(tmin)}),
  * cost: the blur halo is recomputed per slice tile (same overhead ratio
    the standalone build pays per build tile).

Equivalence is checked on-device per d (bf16-ulp-level; see the fused
kernel's docstring for the two benign divergence sources).

Run on the chip: python tools/fused_ab_r4.py [d ...]
Chip-sequential: run alone.
"""

from __future__ import annotations

import functools
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import fast
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pipeline(img, levels: int, d: int, fused: bool):
    planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    params = BilateralParams(uniform_alpha=True)
    out = fast._grid_pipeline_planar(planar, params, levels, d, fused=fused)
    return jnp.transpose(out, (1, 2, 0))


def main():
    compile_cache.enable()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    ds = [int(a) for a in args] or [2, 4, 8]
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
    render = jax.device_put(render_h)
    noise = jax.device_put(noise_h)
    n_px = h * w

    for d in ds:
        if not smoke:
            ks = (1, 16, 64) if d >= 8 else (1, 8, 32) if d > 2 else (1, 4, 16)
            for content_name, img in (("render", render), ("noise", noise)):
                for fused in (False, True):
                    mpix, fit = chiptime.measure_mpix(
                        lambda x, d=d, f=fused: pipeline(x, 6, d, f),
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
        a = np.asarray(pipeline(render, 6, d, False))
        b = np.asarray(pipeline(render, 6, d, True))
        print(f"d={d} max|two-fused| render = {np.abs(a - b).max():.2e}")
        an = np.asarray(pipeline(noise, 6, d, False))
        bn = np.asarray(pipeline(noise, 6, d, True))
        print(f"d={d} max|two-fused| noise  = {np.abs(an - bn).max():.2e}")


if __name__ == "__main__":
    main()
