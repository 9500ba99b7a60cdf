"""Interleaved chip A/B: pad-free grid layout WITH all-overhang block
zero-fill vs the legacy build-then-pad pipeline (follow-up to
tools/padfree_ab_r5.py, which measured pad-free -19% at d=4 / wash-to--4%
at d=8 when the overhang blocks did full blur work).

The build kernel now predicates on the block index: blocks entirely beyond
the dup cells write zeros and skip the input DMA + all K blur levels
(ops/fast.py _build_grid_pallas). At 4K this removes a whole build-block
column at d=4 (5x5 -> effectively 5x4 + 5 near-free blocks) and at d=8,
while keeping the pad-free win of deleting the slice's full-grid pad copy
(~37 MB at d=4). d=2 has no all-overhang blocks at 4K (the slab extent
divides the build tile exactly) -- re-measured only as a regression sanity
check on the shipped default, since the compiled kernel gained a branch.

Chip-session hygiene (round-5 lessons): content is generated ON DEVICE
(one fused program -- no 4K frame crosses the ~1 MB/s tunnel) and the
equality spot-check reads back ONE scalar (jitted max|a-b|), not frames.

Usage: python tools/padfree_skip_ab_r5.py [rounds]  # chip-sequential: run alone
"""

from __future__ import annotations

import functools
import sys

import numpy as np  # noqa: F401 (kept for parity with sibling tools)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import fast
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render_expr

    compile_cache.enable()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    h, w = 2160, 3840
    scene = synthetic_render_expr(h, w, seed=1)

    @jax.jit
    def _mk(key):
        k1, k2 = jax.random.split(key)
        render = (
            scene() + 0.05 * jax.random.normal(k1, (h, w, 4), jnp.float32)
        ).at[..., 3].set(1.0)
        noise = jax.random.uniform(k2, (h, w, 4), jnp.float32).at[..., 3].set(
            1.0
        )
        return render, noise

    render, noise = _mk(jax.random.PRNGKey(0))
    float(render[0, 0, 0])  # fence (block_until_ready does not, CLAUDE.md)
    imgs = {"render": render, "noise": noise}
    bp = BilateralParams(uniform_alpha=True)

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def pipeline(img, K: int, d: int, pad_free: bool):
        planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
        out = fast._grid_pipeline_planar(planar, bp, K, d, pad_free=pad_free)
        return jnp.transpose(out, (1, 2, 0))

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def maxdiff(img, K: int, d: int):
        a = pipeline(img, K, d, False)
        b = pipeline(img, K, d, True)
        return jnp.max(jnp.abs(a - b))

    # Chip smoke + equality first (the kernel gained a branch + a full-block
    # zero store: Mosaic compile-only traps don't show in interpret mode,
    # CLAUDE.md) -- one scalar readback per d.
    for d in (2, 4, 8):
        K = 5 if d < 8 else 6
        print(
            f"d={d} chip max|legacy-padfree| = {float(maxdiff(render, K, d)):.2e}",
            flush=True,
        )

    for d in (4, 8, 2):  # d=2 last: it's the sanity check, not the question
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
