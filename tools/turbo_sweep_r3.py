"""Round-3 turbo bilateral sweep: quality (dB vs exact) and on-chip
throughput across (downsample, levels) settings, on both content classes:

  * render: synthetic render-like content (piecewise-smooth regions, edges,
    gradients + noise) -- the content class the reference denoises
    (CornellBox/Bathroom renders) and where per-tile level culling engages.
  * noise: full-range iid uniform noise -- the data-independent worst case
    (every tile spans every level; culling never fires).

Usage: python tools/turbo_sweep_r3.py [--quality-only] [--throughput-only]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import bilateral, bilateral_fast
from image_denoising_filter_tpu.ops import reference as ref
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render

compile_cache.enable()


def quality_table():
    rng = np.random.default_rng(7)
    h, w = 512, 1024
    clean = synthetic_render(h, w, seed=3)
    noisy = (clean + rng.normal(0, 0.05, clean.shape)).astype(np.float32)
    noisy[..., 3] = 1.0
    dev = jax.device_put(noisy)
    bp = BilateralParams(uniform_alpha=True)
    exact = np.asarray(bilateral(dev, bp))[..., :3]
    print("quality (dB vs exact kernel, render-like 512x1024):")
    for d in (2, 4, 8):
        for levels in (5, 6, 8):
            got = np.asarray(bilateral_fast(dev, bp, levels, d))[..., :3]
            db = ref.psnr(got, exact)
            dn = ref.psnr(got, clean[..., :3])
            dn_exact = ref.psnr(exact, clean[..., :3])
            print(
                f"  d={d} K={levels}: {db:6.1f} dB vs exact | denoise "
                f"{dn:5.1f} dB (exact {dn_exact:5.1f})"
            )


def throughput_table():
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    bp = BilateralParams(uniform_alpha=True)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    noise = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise[..., 3] = 1.0
    print("throughput (4K, slope-timed ks=(1,8,32)):")
    for name, img_h in (("render", render), ("noise", noise)):
        img = jax.device_put(img_h)
        for d in (2, 4, 8):
            for levels in (6, 8):
                mpix, fit = chiptime.measure_mpix(
                    lambda x, L=levels, D=d: bilateral_fast(x, bp, L, D),
                    img,
                    n_pixels=h * w,
                )
                print(
                    f"  {name:6s} d={d} K={levels}: {mpix:7.1f} Mpix/s "
                    f"(slope {fit.slope*1e3:.3f} ms, spread {fit.spread:.1%})"
                )


if __name__ == "__main__":
    if "--throughput-only" not in sys.argv:
        quality_table()
    if "--quality-only" not in sys.argv:
        throughput_table()
