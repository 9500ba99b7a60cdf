"""On-chip spot check + timing for the round-2 perf work: fast pool, exp2
kernels. Prints timings and small-image oracle PSNR/maxerr for each path.

Run: python -u tools/r2_check.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from image_denoising_filter_tpu.config import BilateralParams, NlmParams
from image_denoising_filter_tpu.ops import bilateral, bilateral_fast, nlm_accumulate
from image_denoising_filter_tpu.ops import reference as ref


def slope_time(fn, *args, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x, *e):
            def body(i, v):
                out = fn(v, *e)
                if isinstance(out, tuple):
                    out = out[0]
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
    img2 = jax.device_put(
        np.concatenate(
            [
                rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
                np.ones((h, w, 1), np.float32),
            ],
            axis=-1,
        )
    )
    bp = BilateralParams(uniform_alpha=True)
    nlp = NlmParams(uniform_alpha=True)

    # --- correctness on a small image (compiled path, not interpret) -------
    small = np.asarray(rng.uniform(0, 1, (96, 256, 4)), np.float32)
    small[..., 3] = 1.0
    got = np.asarray(bilateral(jax.device_put(small), bp))
    want = ref.bilateral_reference(small, bp)
    err = np.abs(got - want).max()
    print(f"bilateral exp2 vs oracle: maxerr={err:.2e}", flush=True)
    assert err < 2e-4, err

    nb = np.asarray(rng.uniform(0, 1, (96, 256, 4)), np.float32)
    wc, nw = nlm_accumulate(jax.device_put(small), jax.device_put(nb), NlmParams())
    wwc, wnw = ref.nlm_reference(small, nb, NlmParams())
    err_n = max(
        np.abs(np.asarray(wc) - wwc).max() / max(wwc.max(), 1),
        np.abs(np.asarray(nw) - wnw).max() / max(wnw.max(), 1),
    )
    print(f"nlm exp2 vs oracle: rel maxerr={err_n:.2e}", flush=True)
    assert err_n < 2e-4, err_n

    # --- timings ------------------------------------------------------------
    for d in (2, 4):
        t = slope_time(lambda x, d=d: bilateral_fast(x, bp, 8, d), img)
        print(f"turbo d={d} full HWC: {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)

    from image_denoising_filter_tpu.ops.fast import bilateral_fast_planar

    planar = jax.device_put(np.transpose(img_h, (2, 0, 1)).copy())
    for d in (2, 4):
        t = slope_time(lambda x, d=d: bilateral_fast_planar(x, bp, 8, d), planar)
        print(f"turbo d={d} planar:   {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)

    t = slope_time(lambda x: bilateral(x, bp), img)
    print(f"bilateral exact:    {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)

    t = slope_time(lambda nb_, tgt: nlm_accumulate(tgt, nb_, nlp)[0], img2, img)
    print(f"nlm exact:          {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)

    nlp_t = NlmParams(uniform_alpha=True, search_stride=2)
    t = slope_time(lambda nb_, tgt: nlm_accumulate(tgt, nb_, nlp_t)[0], img2, img)
    print(f"nlm turbo stride2:  {t*1e3:7.2f} ms  {px/t:7.0f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
