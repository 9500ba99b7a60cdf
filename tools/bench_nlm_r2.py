"""Round-2 NLM kernel sweep on the real chip: tile shapes, frame batching,
search_stride. Prints Mpix/s (slope-timed)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from image_denoising_filter_tpu.utils import compile_cache

compile_cache.enable()

from image_denoising_filter_tpu.config import NlmParams, TilingConfig
from image_denoising_filter_tpu.ops import nlm_accumulate, nlm_accumulate_frames


def slope_time(chain_fn, x0, *extra, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x, *e):
            out = jax.lax.fori_loop(0, kk, lambda i, v: chain_fn(v, *e), x)
            return jnp.sum(out[0, 0])

        float(f(x0, *extra))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(x0, *extra))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img2_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img_h[..., 3] = 1.0
    img2_h[..., 3] = 1.0
    img = jax.device_put(img_h)
    img2 = jax.device_put(img2_h)

    which = sys.argv[1:] or ["tiles"]

    if "tiles" in which:
        for th, tw in [(64, 512), (128, 512), (256, 512), (64, 1024), (128, 1024)]:
            nlp = NlmParams(uniform_alpha=True)
            tl = TilingConfig(tile_h=th, tile_w=tw)
            dt = slope_time(lambda nb: nlm_accumulate(img, nb, nlp, tl)[0], img2)
            print(f"nlm tile {th}x{tw}: {h*w/dt/1e6:.1f} Mpix/s")

    if "stride" in which:
        nlp = NlmParams(uniform_alpha=True, search_stride=2)
        dt = slope_time(lambda nb: nlm_accumulate(img, nb, nlp)[0], img2)
        print(f"nlm stride2 (49 offsets): {h*w/dt/1e6:.1f} Mpix/s")

    if "frames" in which:
        f = 8
        frames = jax.device_put(
            np.stack([img2_h] * f).astype(np.float32)
        )
        nlp = NlmParams(uniform_alpha=True)

        def run(fr):
            wc, _ = nlm_accumulate_frames(img, fr, nlp)
            return wc

        @jax.jit
        def g(fr):
            return jnp.sum(run(fr)[0, 0])

        float(g(frames))
        t0 = time.perf_counter()
        for _ in range(3):
            float(g(frames))
        dt = (time.perf_counter() - t0) / 3
        print(f"nlm batched {f} frames: {f*h*w/dt/1e6:.1f} Mpix/s/frame-pass ({dt*1e3:.1f} ms)")

    if "bf16" in which:
        nlp = NlmParams(uniform_alpha=True)
        tl = TilingConfig(compute_dtype="bfloat16")
        dt = slope_time(lambda nb: nlm_accumulate(img, nb, nlp, tl)[0], img2)
        print(f"nlm bf16 taps: {h*w/dt/1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
