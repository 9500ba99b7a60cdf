"""Chip validation for the round-5 s6hrwdisk NLM row (s=6 disk trim +
half-res weight field): compile smoke (the s=6+disk+hrw Pallas variant has
never run on the chip -- Mosaic compile-only traps don't show in interpret
mode, CLAUDE.md), 4K quality gate vs the exact kernel on render content
(the bench gate cell), and an interleaved A/B vs s6disk (the current
geomean carrier).

CPU screen said quality-neutral vs s6disk (tools/ commit adbfa2c); round-4
measured hrw at ~+19% over full-res weights on the s=7 disk row. A >=40 dB
4K gate + a sign-consistent speed win makes s6hrwdisk the geomean carrier
in the next full capture (bench.py already carries the row).

Usage: python tools/s6hrwdisk_chip_r5.py [rounds]  # chip-sequential: run alone
"""

from __future__ import annotations

import math
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_denoising_filter_tpu.config import NlmParams, TilingConfig
    from image_denoising_filter_tpu.ops import nlm_accumulate, normalize
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render_expr

    compile_cache.enable()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    h, w = 2160, 3840
    scene = synthetic_render_expr(h, w, seed=1)

    @jax.jit
    def _mk(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        mk_r = lambda kk: (  # noqa: E731
            scene() + 0.05 * jax.random.normal(kk, (h, w, 4), jnp.float32)
        ).at[..., 3].set(1.0)
        mk_u = lambda kk: jax.random.uniform(  # noqa: E731
            kk, (h, w, 4), jnp.float32
        ).at[..., 3].set(1.0)
        return mk_r(k1), mk_r(k2), mk_u(k3), mk_u(k4)

    render, render2, noise, noise2 = _mk(jax.random.PRNGKey(0))
    float(render[0, 0, 0])  # fence

    bf16 = TilingConfig(compute_dtype="bfloat16")
    exact = NlmParams(uniform_alpha=True)
    s6disk = NlmParams(
        uniform_alpha=True, search_radius=6, search_stride=2, search_disk=True
    )
    s6hrwdisk = NlmParams(
        uniform_alpha=True,
        search_radius=6,
        search_stride=2,
        search_disk=True,
        weights_halfres=True,
    )

    @jax.jit
    def _mse(a, b):
        d = a[..., :3] - b[..., :3]
        return jnp.mean(d * d)

    def psnr(a, b) -> float:
        return -10.0 * math.log10(float(_mse(a, b)))

    # Gate cells (render content, the bench 4K gate): one scalar readback
    # each -- no frames cross the tunnel.
    want = normalize(*nlm_accumulate(render, render2, exact))
    for name, cfg in (("s6disk", s6disk), ("s6hrwdisk", s6hrwdisk)):
        got = normalize(*nlm_accumulate(render, render2, cfg, bf16))
        db = psnr(got, want)
        print(f"{name}: {db:.2f} dB vs exact at 4K (gate {'OK' if db >= 40 else 'FAIL'})", flush=True)

    # Interleaved speed A/B, accumulate-only (the bench row semantics),
    # noise content (the bench NLM measurement content).
    chiptime.ab_compare(
        {
            "s6disk": lambda nb, tgt: nlm_accumulate(tgt, nb, s6disk, bf16),
            "s6hrwdisk": lambda nb, tgt: nlm_accumulate(
                tgt, nb, s6hrwdisk, bf16
            ),
        },
        noise2,
        noise,
        n_pixels=h * w,
        ks=(1, 4, 10),
        rounds=rounds,
    )


if __name__ == "__main__":
    main()
