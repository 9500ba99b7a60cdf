"""Round-4 stage profiler for the TURBO guided-layers pipeline at 4K.

The guided pipeline (ops/fast.py:cross_bilateral_layers_fast) is the weakest
gated turbo row (round-3 builder capture: 946 Mpix/s/layer at d=2, 2,343 at
d=4 vs bilateral turbo's 1,916 / 6,478). Before deciding whether a fused
build+slice kernel (the round-4 bilateral experiment) is worth porting to the
7-plane guided grid, measure where the time actually goes: two pools, the
range reduce, the 7K-plane grid build, and the unnormalized slice.

Times each stage with the shared chiptime slope on the chip:
    python tools/guided_prof_r4.py [d] [levels] [noise|render]
Chip-sequential: run alone.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from image_denoising_filter_tpu.config import LayersParams
from image_denoising_filter_tpu.ops import fast
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render

compile_cache.enable()


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    content = sys.argv[3] if len(sys.argv) > 3 else "render"
    h, w = 2160, 3840
    if os.environ.get("GUIDED_PROF_SMOKE"):  # tiny CPU shape check
        h, w = 112, 384
    rng = np.random.default_rng(0)
    if content == "render":
        img = synthetic_render(h, w, seed=1)
        img = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    else:
        img = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img[..., 3] = 1.0
    layer = synthetic_render(h, w, seed=2)  # G-buffer-like clean guide
    layer[..., 3] = 1.0
    lp = LayersParams()
    target_d = jax.device_put(img)
    layer_d = jax.device_put(layer)
    t_planar = jax.device_put(np.transpose(img, (2, 0, 1)).copy())
    l_planar = jax.device_put(np.transpose(layer, (2, 0, 1)).copy())
    px = h * w / 1e6

    def t(label, fn, x0, *extra, ks=(1, 8, 32)):
        fit = chiptime.slope_time(fn, x0, *extra, ks=ks, repeats=4)
        print(
            f"{label:26s} {fit.slope*1e3:8.3f} ms  {px/fit.slope:8.0f} "
            f"Mpix/s  (spread {fit.spread:.1%})",
            flush=True,
        )
        return fit.slope

    t(
        f"full guided turbo d={d}",
        lambda tt: fast.normalize_layers_fast(
            *fast.cross_bilateral_layers_fast(tt, layer_d, lp, levels, d)
        ),
        target_d,
    )
    t(
        f"partials only d={d}",
        lambda tt: fast.cross_bilateral_layers_fast(tt, layer_d, lp, levels, d)[0],
        target_d,
    )

    # Stages (planar inputs; 4K is d-divisible so no pre-pad is needed).
    t("pool target", lambda x: fast._pool_pallas(x, d), t_planar)
    small_t = jax.device_put(np.asarray(fast._pool_pallas(t_planar, d)))
    small_l = jax.device_put(np.asarray(fast._pool_pallas(l_planar, d)))

    lmin = jnp.zeros((3,))
    step = jnp.full((3,), 1.0 / (levels - 1))
    taps = fast._grid_taps(lp.sigma_spatial, d)
    print(f"taps: {len(taps)}")
    inv2sc = 0.5 / lp.sigma_color**2
    bth, btw = fast._default_build_tile(d)
    t(
        "guided grid build (7K)",
        lambda st: fast._build_guided_grid_pallas(
            st, small_l, lmin, step, levels, taps, lp.border, inv2sc,
            tile_h=bth, tile_w=btw,
        ),
        small_t,
    )

    grid = jax.device_put(
        np.asarray(
            fast._build_guided_grid_pallas(
                small_t, small_l, lmin, step, levels, taps, lp.border,
                inv2sc, tile_h=bth, tile_w=btw,
            )
        )
    )
    dth, dtw = fast._default_slice_tile(d)
    tile_h = max(16 * d, min(dth, fast._round_up(h, 16 * d)))
    tile_w = max(128 * d, min(dtw, fast._round_up(w, 128 * d)))
    t(
        "guided slice (7 planes)",
        lambda g: fast._slice_guided_grid_pallas(
            l_planar[:3], g, lmin, 1.0 / step, levels, d, tile_h, tile_w,
            pad_edge=True,
        ),
        grid,
    )


if __name__ == "__main__":
    main()
