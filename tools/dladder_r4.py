"""Round-4 quality screen: bilateral turbo at intermediate downsamples
d in {4, 5, 6, 8} on the BINDING gate (4K render content, dB vs the exact
kernel).

Motivation: d=4 gates with 1.8 dB of margin (41.8 dB at 4K) while d=8 fails
by 3.2 dB (36.8) -- if d=5 or d=6 lands above 40 dB it would be a faster
gated setting than d=4 (pipeline cost scales ~1/d^2 for pool/build and the
slice's per-pixel work is d-independent, so the win is bounded but real).
The grid pipeline takes any d >= 1 (4K is divisible by 5 and 6; other
shapes pre-pad, fast.py:_grid_pipeline_planar). CPU-runnable; a PASS here
queues a chip A/B + bench row, a fail is a documented negative.

Run: JAX_PLATFORMS=cpu python tools/dladder_r4.py [--small]
--small uses 1080x1920 (faster; the 4K gate is the one that binds, run full
for the record).
"""

from __future__ import annotations

import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import bilateral_fast
from image_denoising_filter_tpu.ops import reference as ref
from image_denoising_filter_tpu.ops.xla import bilateral_xla
from image_denoising_filter_tpu.utils.content import synthetic_render


def main() -> None:
    h, w = (1080, 1920) if "--small" in sys.argv else (2160, 3840)
    rng = np.random.default_rng(0)
    img = synthetic_render(h, w, seed=1)
    img = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    img[..., 3] = 1.0
    bp = BilateralParams(uniform_alpha=True)
    print(f"--- bilateral turbo d-ladder ({h}x{w} render, vs exact) ---")
    t0 = time.time()
    exact = np.asarray(bilateral_xla(img, bp))[..., :3]
    print(f"  exact oracle: {time.time() - t0:.0f} s")
    for d in (4, 5, 6, 8):
        t0 = time.time()
        got = np.asarray(bilateral_fast(img, bp, 6, d))[..., :3]
        db = ref.psnr(got, exact)
        mark = "PASS" if db >= 40.0 else "fail"
        print(f"  d={d}: {db:5.1f} dB vs exact [{mark}]  ({time.time() - t0:.0f} s)")


if __name__ == "__main__":
    main()
