"""Round-2 bilateral kernel sweep on the real chip (slope-timed Mpix/s)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from image_denoising_filter_tpu.utils import compile_cache

compile_cache.enable()

from image_denoising_filter_tpu.config import BilateralParams, TilingConfig
from image_denoising_filter_tpu.ops import bilateral


def slope_time(chain_fn, x0, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x):
            out = jax.lax.fori_loop(0, kk, lambda i, v: chain_fn(v), x)
            return jnp.sum(out[0, 0])

        float(f(x0))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(x0))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img_h[..., 3] = 1.0
    img = jax.device_put(img_h)
    bp = BilateralParams(uniform_alpha=True)

    which = sys.argv[1:] or ["tiles"]
    if "tiles" in which:
        for th, tw in [(128, 512), (256, 512), (128, 1024), (256, 1024)]:
            tl = TilingConfig(tile_h=th, tile_w=tw)
            dt = slope_time(lambda x: bilateral(x, bp, tl), img)
            print(f"bilateral tile {th}x{tw}: {h*w/dt/1e6:.1f} Mpix/s", flush=True)
    if "bf16" in which:
        tl = TilingConfig(compute_dtype="bfloat16")
        dt = slope_time(lambda x: bilateral(x, bp, tl), img)
        print(f"bilateral bf16 taps: {h*w/dt/1e6:.1f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
