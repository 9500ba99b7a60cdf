"""Interleaved chip A/B: K=5 vs K=6 levels for the d=8 bilateral grid.

Round-3's quality ladder measured K=5 equal to K=6 within 0.1 dB at EVERY d
on both gate contents (docs/PERFORMANCE.md), and round-4 flipped the d=2 and
d=4 defaults to K=5 on interleaved wins (+11-13% / +10-16%) -- but d=8 was
never speed-tested at K=5. The d8s6 bench row (the fastest gated mode,
8.1-8.8 Gpix/s across round-5 captures) runs K=6; a K=5 win of the same
class would lift it ~10% and with it the gated-turbo geomean's bilateral
leg. Gates first (sigma_spatial=6, the d8s6 configuration, 4K render cell),
then the interleaved A/B at sigma 6 AND the reference sigma 2.

Usage: python tools/d8k5_ab_r5.py [rounds]  # chip-sequential: run alone
"""

from __future__ import annotations

import functools
import math
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import bilateral, bilateral_fast
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
    float(render[0, 0, 0])  # fence

    bp6 = BilateralParams(uniform_alpha=True, sigma_spatial=6.0)

    @jax.jit
    def _mse(a, b):
        d = a[..., :3] - b[..., :3]
        return jnp.mean(d * d)

    def psnr(a, b) -> float:
        return -10.0 * math.log10(float(_mse(a, b)))

    @functools.partial(jax.jit, static_argnums=(1,))
    def turbo6(img, K: int):
        return bilateral_fast(img, bp6, K, 8)

    # Gate cells at sigma 6 (the d8s6 row's configuration).
    want = bilateral(render, bp6)
    for K in (6, 5):
        db = psnr(turbo6(render, K), want)
        print(
            f"d=8 sigma6 K={K}: {db:.2f} dB vs exact at 4K "
            f"(gate {'OK' if db >= 40 else 'FAIL'})",
            flush=True,
        )

    for sg, bp_s in (("s6", bp6), ("s2", BilateralParams(uniform_alpha=True))):
        for name, img in (("render", render), ("noise", noise)):
            print(f"--- d=8 {sg} {name} ---", flush=True)
            chiptime.ab_compare(
                {
                    "K6": lambda x, b=bp_s: bilateral_fast(x, b, 6, 8),
                    "K5": lambda x, b=bp_s: bilateral_fast(x, b, 5, 8),
                },
                img,
                n_pixels=h * w,
                ks=(1, 16, 64),
                rounds=rounds,
            )


if __name__ == "__main__":
    main()
