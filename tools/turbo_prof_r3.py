"""Round-3 stage profiler for the turbo bilateral-grid pipeline at 4K.

Times each stage with the shared chiptime slope (ks=(1,8,32)) on the chip:
transpose, pool, range-reduce, grid build, grid pad, slice. Run:
    python tools/turbo_prof_r3.py [d] [levels] [noise|render]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import fast
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render

compile_cache.enable()


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    content = sys.argv[3] if len(sys.argv) > 3 else "noise"
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    if content == "render":
        img = synthetic_render(h, w, seed=1)
        img = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    else:
        img = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img[..., 3] = 1.0
    planar = jax.device_put(np.transpose(img, (2, 0, 1)).copy())
    bp = BilateralParams(uniform_alpha=True)
    px = h * w / 1e6

    def t(label, fn, x0, *extra, ks=(1, 8, 32)):
        fit = chiptime.slope_time(fn, x0, *extra, ks=ks, repeats=4)
        print(
            f"{label:24s} {fit.slope*1e3:8.3f} ms  {px/fit.slope:8.0f} "
            f"Mpix/s  (spread {fit.spread:.1%})",
            flush=True,
        )
        return fit.slope

    t_full = t(
        f"planar pipeline d={d}",
        lambda x: fast._grid_pipeline_planar(x, bp, levels, d),
        planar,
    )

    # The pipeline's MXU pool kernel (4K is d-divisible, no pre-pad needed).
    t_pool = t(f"pool d={d}", lambda x: fast._pool_pallas(x, d), planar)

    small = jax.device_put(np.asarray(fast._pool_pallas(planar, d)))
    t_range = t(
        "range reduce (pooled)",
        lambda s: jnp.min(s[:3], axis=(1, 2)).sum() + jnp.max(s[:3], axis=(1, 2)).sum()
        + 0 * jnp.sum(s[:1, :1, :1]),
        small,
    )

    lmin = jnp.zeros((3,))
    step = jnp.full((3,), 1.0 / (levels - 1))
    taps = fast._grid_taps(bp.sigma_spatial, d)
    print(f"taps: {len(taps)}")
    inv2sc = 0.5 / bp.sigma_color**2
    bth, btw = fast._default_build_tile(d)
    t_build = t(
        "grid build",
        lambda s: fast._build_grid_pallas(
            s,
            lmin,
            step,
            levels,
            taps,
            bp.border,
            inv2sc,
            tile_h=bth,
            tile_w=btw,
            uniform_alpha=True,
        ),
        small,
    )

    grid = fast._build_grid_pallas(
        small,
        lmin,
        step,
        levels,
        taps,
        bp.border,
        inv2sc,
        tile_h=bth,
        tile_w=btw,
        uniform_alpha=True,
    )
    grid = jax.device_put(np.asarray(grid))
    t_pad = t(
        "grid edge pad",
        lambda g: jnp.pad(g, ((0, 0), (1, 1), (1, 1)), mode="edge"),
        grid,
    )

    tile_h, tile_w = fast._default_slice_tile(d)
    hp2 = -(-h // tile_h) * tile_h
    wp2 = -(-w // tile_w) * tile_w
    guide = jax.device_put(
        np.pad(
            np.transpose(img[..., :3], (2, 0, 1)),
            ((0, 0), (0, hp2 - h), (0, wp2 - w)),
            mode="edge",
        )
    )
    grid_p = jax.device_put(np.asarray(jnp.pad(grid, ((0, 0), (1, 1), (1, 1)), mode="edge")))
    av = jnp.float32(1.0)

    t_slice = t(
        "slice kernel",
        lambda gd: fast._slice_grid_pallas(
            gd,
            grid_p,
            lmin,
            1.0 / step,
            levels,
            d,
            tile_h,
            tile_w,
            uniform_alpha=True,
            alpha_val=av,
        ),
        guide,
    )

    print(
        f"sum of stages: {(t_pool+t_range+t_build+t_pad+t_slice)*1e3:.3f} ms "
        f"vs pipeline {t_full*1e3:.3f} ms"
    )


if __name__ == "__main__":
    main()
