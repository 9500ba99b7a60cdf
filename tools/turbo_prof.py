"""Stage-level profiling of the turbo bilateral-grid pipeline at 4K.

Times (slope method, K=1 vs K=4 chained apps in one jit) the full public
entry, the planar core, and each stage: transpose, pool, grid build, slice.
Run on the TPU chip: python tools/turbo_prof.py [d]
"""

from __future__ import annotations

import functools
import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import fast


def slope_time(fn, *args, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x, *e):
            def body(i, v):
                out = fn(v, *e)
                if out.shape == x.shape:
                    return out
                # keep the carry shape closed but data-dependent on `out`
                # so the loop stays sequential and un-foldable
                return v + jnp.sum(out.ravel()[:1]) * jnp.float32(1e-30)

            out = jax.lax.fori_loop(0, kk, body, x)
            return jnp.sum(out.ravel()[0])

        float(f(args[0], *args[1:]))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(args[0], *args[1:]))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.uniform(0, 1, (h, w, 4)).astype(np.float32))
    planar = jax.device_put(rng.uniform(0, 1, (4, h, w)).astype(np.float32))
    bp = BilateralParams(uniform_alpha=True)
    levels = 8
    px = h * w / 1e6

    t_full = slope_time(lambda x: fast.bilateral_fast(x, bp, levels, d), img)
    print(f"full (HWC in/out):   {t_full*1e3:8.2f} ms  {px/t_full/1e3:8.1f} Mpix/s")

    t_planar = slope_time(
        lambda x: fast.bilateral_fast_planar(x, bp, levels, d), planar
    )
    print(f"planar core:         {t_planar*1e3:8.2f} ms  {px/t_planar/1e3:8.1f} Mpix/s")

    # transpose alone
    t_tr = slope_time(lambda x: jnp.transpose(x, (2, 0, 1)).reshape(4, h, w), img)
    print(f"HWC->CHW transpose:  {t_tr*1e3:8.2f} ms")

    # stage: min/max reduction
    t_mm = slope_time(
        lambda x: (jnp.min(x[:3], axis=(1, 2)) + jnp.max(x[:3], axis=(1, 2)))[
            :, None, None
        ]
        * jnp.ones((3, h, w)),
        planar,
    )
    print(f"min/max (+broadcast):{t_mm*1e3:8.2f} ms")

    # stage: pool
    t_pool = slope_time(lambda x: fast._downsample(x, d), planar)
    print(f"pool d={d}:            {t_pool*1e3:8.2f} ms")

    # stage: grid build (pallas) on pooled image
    small = fast._downsample(planar, d)
    small = jax.device_put(np.asarray(small))
    lmin = jnp.zeros((3,))
    step = jnp.full((3,), 1.0 / (levels - 1))
    r = bp.effective_radius
    taps = fast._gauss_taps(bp.sigma_spatial / d, max(1, int(math.ceil(r / d))))

    t_build = slope_time(
        lambda x: fast._build_grid_pallas(
            x, lmin, step, levels, taps, bp.border, 0.5 / bp.sigma_color**2
        ),
        small,
    )
    print(f"grid build (pallas): {t_build*1e3:8.2f} ms")

    # stage: grid pad + slice
    grid = fast._build_grid_pallas(
        small, lmin, step, levels, taps, bp.border, 0.5 / bp.sigma_color**2
    )
    grid = jax.device_put(np.asarray(grid))
    guide = jax.device_put(np.asarray(planar[:3]))

    def do_slice(g):
        gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1)), mode="edge")
        return fast._slice_grid_pallas(
            guide, gp, lmin, 1.0 / step, levels, d, 128, 512
        )

    t_slice = slope_time(do_slice, grid)
    print(f"grid pad+slice:      {t_slice*1e3:8.2f} ms")

    t_pad = slope_time(lambda g: jnp.pad(g, ((0, 0), (1, 1), (1, 1)), mode="edge"), grid)
    print(f"grid pad alone:      {t_pad*1e3:8.2f} ms")

    print(
        f"stages sum ~ {1e3*(t_tr*2 + t_mm + t_pool + t_build + t_slice):.2f} ms "
        f"vs planar {t_planar*1e3:.2f} + 2 transposes"
    )


if __name__ == "__main__":
    main()
