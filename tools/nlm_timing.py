"""NLM mode timings + quality on the chip: exact / bf16 / stride2 / both,
plus 1080p rows for the README table.

python -u tools/nlm_timing.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from image_denoising_filter_tpu.config import BilateralParams, NlmParams, TilingConfig
from image_denoising_filter_tpu.ops import bilateral, bilateral_fast, nlm_accumulate, normalize
from image_denoising_filter_tpu.ops import reference as ref


def slope_time(fn, *args, iters=3, k=6):
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


BF16 = TilingConfig(compute_dtype="bfloat16")


def noisy_pair(rng, h=512, w=1024):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    clean = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            0.5 + 0.4 * np.cos(xx / 53.0 + yy / 31.0),
            0.5 + 0.3 * np.sin((xx + yy) / 41.0),
            np.ones((h, w), np.float32),
        ],
        axis=-1,
    ).astype(np.float32)
    a = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    b = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    a[..., 3] = 1.0
    b[..., 3] = 1.0
    return jax.device_put(a.astype(np.float32)), jax.device_put(b.astype(np.float32))


def main():
    rng = np.random.default_rng(0)

    # --- quality: each NLM mode vs the exact NLM output ---------------------
    tq, nq = noisy_pair(rng)
    base = np.asarray(normalize(*nlm_accumulate(tq, nq, NlmParams(uniform_alpha=True))))
    modes = {
        "bf16": (NlmParams(uniform_alpha=True), BF16),
        "stride2": (NlmParams(uniform_alpha=True, search_stride=2), None),
        "stride2+bf16": (NlmParams(uniform_alpha=True, search_stride=2), BF16),
    }
    for name, (p, tl) in modes.items():
        out = np.asarray(normalize(*nlm_accumulate(tq, nq, p, tl)))
        db = ref.psnr(out[..., :3], base[..., :3])
        print(f"nlm {name:13s} vs exact: {db:5.1f} dB", flush=True)

    # --- 4K timings ---------------------------------------------------------
    h, w = 2160, 3840
    px = h * w / 1e6
    img = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img[..., 3] = 1.0
    img2 = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img2[..., 3] = 1.0
    tgt = jax.device_put(img)
    nbr = jax.device_put(img2)

    for name, (p, tl) in [("exact", (NlmParams(uniform_alpha=True), None))] + list(
        modes.items()
    ):
        t = slope_time(lambda nb_, tg, p=p, tl=tl: nlm_accumulate(tg, nb_, p, tl)[0], nbr, tgt)
        print(f"nlm {name:13s} 4K: {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)

    # --- 1080p rows ---------------------------------------------------------
    hh, ww = 1080, 1920
    pxh = hh * ww / 1e6
    a = jax.device_put(img[:hh, :ww].copy())
    b = jax.device_put(img2[:hh, :ww].copy())
    bp = BilateralParams(uniform_alpha=True)
    t = slope_time(lambda x: bilateral(x, bp), a)
    print(f"1080p bilateral exact: {t*1e3:7.2f} ms  {pxh/t:7.0f} Mpix/s", flush=True)
    t = slope_time(lambda nb_, tg: nlm_accumulate(tg, nb_, NlmParams(uniform_alpha=True))[0], b, a)
    print(f"1080p nlm exact:       {t*1e3:7.2f} ms  {pxh/t:7.0f} Mpix/s", flush=True)
    for d in (2, 4):
        t = slope_time(lambda x, d=d: bilateral_fast(x, bp, 8, d), a, k=8)
        print(f"1080p turbo d={d}:      {t*1e3:7.2f} ms  {pxh/t:7.0f} Mpix/s", flush=True)
    for d in (2, 4):
        t = slope_time(lambda x, d=d: bilateral_fast(x, bp, 8, d), jax.device_put(img), k=8)
        print(f"4K turbo d={d} (k=8):   {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
