"""Interleaved chip A/B: pad-free grid layout vs the legacy build-then-pad
pipeline for the turbo bilateral family (round-4 VERDICT #4 "d=2 glue").

pad_free=True makes the build kernel emit the grid directly in the slice
kernel's padded slab layout (_build_grid_pallas extend_to), deleting the
full-grid jnp.pad copy between the two kernels:
  * d=2: the bf16 grid is ~74 MB at 4K -- the pad is ~150 MB of pure HBM
    traffic (~0.5 ms), the single biggest glue item left after round 4's
    fold (the shipped pipeline measured ~2,380 Mpix/s render; 2,400 is the
    round-3 target).
  * d=4: grid ~18 MB -> ~37 MB pad (~0.12 ms on a ~1.1 ms pipeline).
Cost: the build computes and writes the overhang cells too (+10-20% build
work). Outputs match to the stored-grid bf16-ulp contract
(tests/test_fast.py); this measures which side of the trade wins per d.

Usage: python tools/padfree_ab_r5.py [rounds]   # chip-sequential: run alone
"""

from __future__ import annotations

import functools
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import fast
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    noise = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    noise[..., 3] = 1.0
    imgs = {
        "render": jax.device_put(render),
        "noise": jax.device_put(noise),
    }
    bp = BilateralParams(uniform_alpha=True)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def pipeline(img, K: int, d: int, pad_free: bool):
        planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
        out = fast._grid_pipeline_planar(planar, bp, K, d, pad_free=pad_free)
        return jnp.transpose(out, (1, 2, 0))

    # Equality spot-check on the chip first (bitwise off-chip; the chip's
    # compiled path must agree too before any default flip).
    for d in (2, 4, 8):
        a = np.asarray(pipeline(imgs["render"], 5, d, False))
        b = np.asarray(pipeline(imgs["render"], 5, d, True))
        print(f"d={d} max|legacy-padfree| = {np.abs(a - b).max():.2e}", flush=True)

    for d in (2, 4, 8):
        K = 5 if d < 8 else 6  # shipping levels per d
        ks = (1, 16, 64) if d >= 8 else (1, 8, 32) if d > 2 else (1, 4, 16)
        for name, img in imgs.items():
            print(f"--- d={d} K={K} {name} ---", flush=True)
            chiptime.ab_compare(
                {
                    "legacy": lambda x, d=d, K=K: pipeline(x, K, d, False),
                    "padfree": lambda x, d=d, K=K: pipeline(x, K, d, True),
                },
                img,
                n_pixels=h * w,
                ks=ks,
                rounds=rounds,
            )


if __name__ == "__main__":
    main()
