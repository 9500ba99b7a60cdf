"""Measure the turbo grid pipeline at its DEFAULT tiles on the chip.

One row per requested d (argv, default "2 4 8"): 4K render content,
K-chain slope timing, plus dB vs the K=8-level exact-lattice XLA path as a
sanity anchor (the bench's real gates run vs the exact kernel).

Usage: python tools/measure_defaults_r3.py [d ...]
Chip-sequential: run alone.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops.fast import _grid_pipeline_planar
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()

    ds = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    planar = jax.device_put(np.transpose(render, (2, 0, 1)).copy())
    bp = BilateralParams(uniform_alpha=True)
    K = 6

    for d in ds:
        fn = lambda x, d=d: _grid_pipeline_planar(x, bp, K, d)
        ks = (1, 8, 32) if d >= 4 else (1, 4, 16)
        mpix, fit = chiptime.measure_mpix(fn, planar, n_pixels=n_px, ks=ks)
        print(
            f"d={d} defaults: {mpix:.0f} Mpix/s "
            f"({fit.slope * 1e3:.3f} ms, spread {fit.spread * 100:.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
