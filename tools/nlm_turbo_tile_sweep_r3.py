"""Tile sweep for the TURBO NLM kernel (stride-2 search + bf16 taps) at 4K.

The round-2 NLM tile sweep (128x2048 optimum) was run on the FULL-search
exact kernel; the strided kernel has a different VMEM/compute balance
(49 offsets instead of 196), so its optimum may differ.

Usage: python tools/nlm_turbo_tile_sweep_r3.py [thxtw ...]
Chip-sequential: run alone.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    from image_denoising_filter_tpu.config import NlmParams, TilingConfig
    from image_denoising_filter_tpu.ops import nlm_accumulate
    from image_denoising_filter_tpu.utils import chiptime, compile_cache

    compile_cache.enable()

    if len(sys.argv) > 1:
        combos = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]
    else:
        combos = [(128, 2048), (256, 1024), (128, 1024), (64, 2048)]

    h, w = 2160, 3840
    n_px = h * w
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    b = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    a[..., 3] = 1.0
    b[..., 3] = 1.0
    tgt = jax.device_put(a)
    nb = jax.device_put(b)
    nlp = NlmParams(uniform_alpha=True, search_stride=2)

    base = None
    for th, tw in combos:
        tc = TilingConfig(compute_dtype="bfloat16", tile_h=th, tile_w=tw)
        fn = lambda x, tc=tc: nlm_accumulate(tgt, x, nlp, tc)[0]
        try:
            mpix, fit = chiptime.measure_mpix(
                fn, nb, n_pixels=n_px, ks=(1, 4, 10)
            )
        except Exception as e:
            print(f"nlm-turbo tile {th}x{tw}: FAILED {type(e).__name__}: {e}")
            continue
        out = np.asarray(fn(nb))
        if base is None:
            base = out
            db = float("inf")
        else:
            mse = float(np.mean((out - base) ** 2))
            db = 10 * np.log10(1.0 / max(mse, 1e-30))
        print(
            f"nlm-turbo tile {th}x{tw}: {mpix:.0f} Mpix/s "
            f"({fit.slope * 1e3:.3f} ms, spread {fit.spread * 100:.1f}%, "
            f"vs-first {db:.1f} dB)",
            flush=True,
        )


if __name__ == "__main__":
    main()
