"""A/B the grid-edge-pad fold (commit 275c576) on the chip, same session.

The fold removed one full-grid HBM pass: the slice kernel's slab-alignment
pad now also supplies the (1, 1) edge replication (pad_edge=True on a RAW
grid) instead of a separate jnp.pad(grid, edge) copy first. Value-identical
(tests/test_fast.py pad-fold equivalence test); this measures the chip
effect, which the round-3 bench of record predates.

Run on the chip: python tools/fold_ab_r3.py
"""

from __future__ import annotations

import functools
import os

import jax

# The axon sitecustomize forces jax_platforms at interpreter start; honor an
# explicit JAX_PLATFORMS (the CPU smoke sets it) like cli.py/conftest do.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import fast
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render


@functools.partial(jax.jit, static_argnums=(1, 2))
def pipeline_folded(img, levels: int, d: int):
    """HEAD's fused grid pipeline (pad_edge=True), forced even off-TPU so the
    CPU smoke compares the same Pallas path the chip runs (bilateral_fast
    falls back to the pure-JAX lattice on the CPU backend)."""
    planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    params = BilateralParams(uniform_alpha=True)
    out = fast._grid_pipeline_planar(planar, params, levels, d)
    return jnp.transpose(out, (1, 2, 0))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pipeline_unfolded(img, levels: int, d: int, _tag: str = "old"):
    """The pre-fold pipeline: explicit edge pad, pad_edge=False."""
    planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    params = BilateralParams(uniform_alpha=True)
    _, h, w = planar.shape
    inv2sc = 0.5 / (params.sigma_color**2)
    dth, dtw = fast._default_slice_tile(d)
    tile_h = max(16 * d, min(dth, fast._round_up(h, 16 * d)))
    tile_w = max(128 * d, min(dtw, fast._round_up(w, 128 * d)))
    hp, wp = -(-h // d) * d, -(-w // d) * d
    planar_p = jnp.pad(planar, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    small = fast._pool_pallas(planar_p, d)
    lmin = jnp.min(small[:3], axis=(1, 2))
    lmax = jnp.max(small[:3], axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)
    taps = fast._grid_taps(params.sigma_spatial, d)
    bth, btw = fast._default_build_tile(d)
    grid_k = fast._build_grid_pallas(
        small, lmin, step, levels, taps, params.border, inv2sc,
        tile_h=bth, tile_w=btw, uniform_alpha=True,
    )
    # The OLD pre-fold behavior: separate full-grid edge-pad copy.
    grid_pad = jnp.pad(grid_k, ((0, 0), (1, 1), (1, 1)), mode="edge")
    out = fast._slice_grid_pallas(
        planar[:3], grid_pad, lmin, 1.0 / step, levels, d, tile_h, tile_w,
        uniform_alpha=True, alpha_val=planar[3, 0, 0], pad_edge=False,
    )
    return jnp.transpose(out, (1, 2, 0))


def main():
    compile_cache.enable()
    h, w = 2160, 3840
    if os.environ.get("FOLD_AB_SMOKE"):  # tiny CPU smoke (interpret mode)
        h, w = 96, 256
    rng = np.random.default_rng(0)
    img_h = synthetic_render(h, w, seed=1)
    img_h = (img_h + rng.normal(0, 0.05, img_h.shape)).astype(np.float32)
    img_h[..., 3] = 1.0
    img = jax.device_put(img_h)
    bp = BilateralParams(uniform_alpha=True)
    n_px = h * w

    smoke = bool(os.environ.get("FOLD_AB_SMOKE"))
    for d in (2, 4):
        if not smoke:
            ks = (1, 8, 32) if d > 2 else (1, 4, 16)
            for name, fn in (
                ("folded (HEAD)", lambda x, d=d: pipeline_folded(x, 6, d)),
                ("unfolded (pre-275c576)", lambda x, d=d: pipeline_unfolded(x, 6, d)),
            ):
                mpix, fit = chiptime.measure_mpix(fn, img, n_pixels=n_px, ks=ks)
                print(
                    f"d={d} {name}: {mpix:.0f} Mpix/s "
                    f"(slope {fit.slope*1e3:.3f} ms, spread {fit.spread:.1%})"
                )
        # Equivalence spot check on-device (should be exact).
        a = np.asarray(pipeline_folded(img, 6, d))
        b = np.asarray(pipeline_unfolded(img, 6, d))
        print(f"d={d} max|folded-unfolded| = {np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    main()
