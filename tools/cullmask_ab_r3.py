"""A/B the culling-reduction masking variants on the chip, same session.

The slice kernels' per-tile level-culling bounds need boundary-block garbage
handled whenever the image is not tile-multiple (4K never is):

  * cull_mask=True  (round-3 bench-of-record path): full-res iota/where
    replaces garbage with the mid level before the reduce -- tight bounds on
    every block, ~7 VPU ops/px on EVERY block.
  * cull_mask=False: reduce the raw clipped guide; garbage only WIDENS the
    bounds (boundary blocks may cull less) and NaN is defused by scalar
    guards. Zero per-pixel masking cost.

Both are exact (identical outputs). Which is FASTER depends on what the
boundary garbage actually is on the chip (stale VMEM from the previous grid
step vs noise) and how much culling the render content loses. The noise
floor cannot cull either way, so cull_mask=False should be a pure win there.
Round-5: rewired through the shared interleaved harness
(utils/chiptime.ab_compare) -- the round-4 first capture of d=4 (+12.6%
render) was session drift that an interleaved recheck washed out.

Run on the chip: python tools/cullmask_ab_r3.py [rounds]
"""

from __future__ import annotations

import functools
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from image_denoising_filter_tpu.config import BilateralParams
from image_denoising_filter_tpu.ops import fast
from image_denoising_filter_tpu.utils import chiptime, compile_cache
from image_denoising_filter_tpu.utils.content import synthetic_render


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def pipeline(img, levels: int, d: int, cull_mask: bool, out_bf16: bool = False):
    planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    params = BilateralParams(uniform_alpha=True)
    out = fast._grid_pipeline_planar(
        planar, params, levels, d, cull_mask=cull_mask,
        out_dtype=jnp.bfloat16 if out_bf16 else jnp.float32,
    )
    return jnp.transpose(out, (1, 2, 0))


def main():
    compile_cache.enable()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    h, w = 2160, 3840
    smoke = bool(os.environ.get("CULLMASK_AB_SMOKE"))
    if smoke:  # tiny CPU equivalence check (interpret mode)
        h, w = 112, 384  # deliberately ragged at every d's tile floor
    rng = np.random.default_rng(0)
    render_h = synthetic_render(h, w, seed=1)
    render_h = (render_h + rng.normal(0, 0.05, render_h.shape)).astype(
        np.float32
    )
    render_h[..., 3] = 1.0
    noise_h = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise_h[..., 3] = 1.0
    render = jax.device_put(render_h)
    noise = jax.device_put(noise_h)
    n_px = h * w

    for d in (2, 4, 8):
        if not smoke:
            ks = (1, 16, 64) if d >= 8 else (1, 8, 32) if d > 2 else (1, 4, 16)
            for content_name, img in (("render", render), ("noise", noise)):
                print(f"--- d={d} {content_name} ---", flush=True)
                chiptime.ab_compare(
                    {
                        "masked": lambda x, d=d: pipeline(x, 6, d, True),
                        "unmasked": lambda x, d=d: pipeline(x, 6, d, False),
                        "unmasked_bf16out": lambda x, d=d: pipeline(
                            x, 6, d, False, True
                        ),
                    },
                    img,
                    n_pixels=n_px,
                    ks=ks,
                    rounds=rounds,
                )
        a = np.asarray(pipeline(render, 6, d, True))
        b = np.asarray(pipeline(render, 6, d, False))
        print(f"d={d} max|masked-unmasked| = {np.abs(a - b).max():.2e}")
        c = np.asarray(pipeline(render, 6, d, False, True)).astype(np.float32)
        print(f"d={d} max|f32-bf16out| = {np.abs(a - c).max():.2e}")


if __name__ == "__main__":
    main()
