"""Round-3 tile-size sweep for the turbo grid pipeline (d=2 focus).

Motivation (docs/PERFORMANCE.md): both banded-matmul stages burn MXU FLOPs
proportional to tile width over mostly-zero bands -- the build cols-blur
costs ~2.3 kFLOP/cell at tw=1024 vs ~0.8 k at tw=256, and the slice
upsample ~780 FLOP/pix at 256x1024 vs ~390 at 256x256 (d=2). The DMA
alignment floor gws = tile_w/d >= 128 means the narrow options only exist
at d=2 -- exactly the least-tuned mode (docs/STATUS.md round-3 open item).

Usage: python tools/tile_sweep_r3.py [d] [phase]
  phase "slice": sweep slice tiles at the default build tile
  phase "build": sweep build tiles at a given slice tile
Chip-sequential: run one phase at a time.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import fast
    from image_denoising_filter_tpu.ops.fast import _grid_pipeline_planar
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render

    compile_cache.enable()

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    phase = sys.argv[2] if len(sys.argv) > 2 else "slice"

    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    render = synthetic_render(h, w, seed=1)
    render = (render + rng.normal(0, 0.05, render.shape)).astype(np.float32)
    render[..., 3] = 1.0
    planar = jax.device_put(np.transpose(render, (2, 0, 1)).copy())
    bp = BilateralParams(uniform_alpha=True)
    K = 6

    if phase == "slice":
        combos = {
            2: [(256, 1024), (256, 512), (256, 256), (128, 256), (384, 256)],
            4: [(256, 1024), (256, 512), (384, 512)],
            8: [(384, 1024)],
        }[d]
        runs = [((th, tw), None) for th, tw in combos]
    else:
        if len(sys.argv) > 3:
            slice_t = tuple(int(v) for v in sys.argv[3].split("x"))
        else:
            slice_t = {2: (256, 512), 4: (256, 1024), 8: (384, 1024)}[d]
        builds = [(128, 1024), (128, 512), (128, 256), (64, 256), (128, 128)]
        runs = [(slice_t, b) for b in builds]

    base_out = None
    for (th, tw), bt in runs:
        fn = lambda x, th=th, tw=tw, bt=bt: _grid_pipeline_planar(
            x, bp, K, d, tile_h=th, tile_w=tw, build_tile=bt
        )
        ks = (1, 8, 32) if d >= 4 else (1, 4, 16)
        try:
            mpix, fit = chiptime.measure_mpix(
                fn, planar, n_pixels=n_px, ks=ks
            )
        except Exception as e:  # compile-service size limits etc.
            print(f"d={d} slice={th}x{tw} build={bt}: FAILED {type(e).__name__}: {e}")
            continue
        out = np.asarray(fn(planar))
        if base_out is None:
            base_out = out
            db = float("inf")
        else:
            mse = float(np.mean((out[:3] - base_out[:3]) ** 2))
            db = 10 * np.log10(1.0 / max(mse, 1e-30))
        print(
            f"d={d} slice={th}x{tw} build={bt}: {mpix:.0f} Mpix/s "
            f"({fit.slope*1e3:.3f} ms, spread {fit.spread*100:.1f}%, "
            f"vs-first {db:.1f} dB)",
            flush=True,
        )


if __name__ == "__main__":
    main()
