"""Turbo timing + on-chip quality: run after changes to ops/fast.py.

python -u tools/turbo_timing.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import bilateral, bilateral_fast
from image_denoising_filter_tpu.ops import reference as ref


def slope_time(fn, *args, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x, *e):
            def body(i, v):
                out = fn(v, *e)
                if out.shape == x.shape:
                    return out
                return v + jnp.sum(out) * jnp.float32(1e-30)

            return jnp.sum(jax.lax.fori_loop(0, kk, body, x).ravel()[:1])

        float(f(args[0], *args[1:]))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(args[0], *args[1:]))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    h, w = 2160, 3840
    px = h * w / 1e6
    rng = np.random.default_rng(0)
    img_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img_h[..., 3] = 1.0
    img = jax.device_put(img_h)
    bp = BilateralParams(uniform_alpha=True)

    # On-chip quality: noisy structured content, turbo vs exact (the
    # content class turbo targets; tools/tpu_check --check runs the same).
    hq, wq = 512, 1024
    yy, xx = np.mgrid[0:hq, 0:wq].astype(np.float32)
    clean = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            0.5 + 0.4 * np.cos(xx / 53.0 + yy / 31.0),
            0.5 + 0.3 * np.sin((xx + yy) / 41.0),
            np.ones((hq, wq), np.float32),
        ],
        axis=-1,
    ).astype(np.float32)
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    noisy[..., 3] = 1.0
    exact = np.asarray(bilateral(jax.device_put(noisy), bp))
    for d in (2, 4):
        fastv = np.asarray(bilateral_fast(jax.device_put(noisy), bp, 8, d))
        db = ref.psnr(fastv[..., :3], exact[..., :3])
        print(f"turbo d={d} vs exact on-chip: {db:.1f} dB", flush=True)

    for d in (2, 4):
        t = slope_time(lambda x, d=d: bilateral_fast(x, bp, 8, d), img)
        print(f"turbo d={d} full HWC: {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
