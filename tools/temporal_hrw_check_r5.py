"""Chip check: can the temporal serving row's turbo path upgrade from
stride-2 disk (s=7) to s6hrwdisk (s=6 disk + half-res weights)?

The spatial s6hrwdisk row chip-validated at 40.35 dB / 1,126 Mpix/s
(tools/s6hrwdisk_chip_r5.py); the temporal config is 5 neighbour frames of
the same content class accumulated by the frame-batched kernel, so quality
should track the spatial cell -- but the row publishes a self-gate either
way (bench.py temporal_turbo_db_vs_exact), and this check decides the
DEFAULT before the capture of record ships it. Measures dB vs the exact
5-frame pipeline and the fps of both turbo variants, interleaved.

Usage: python tools/temporal_hrw_check_r5.py [rounds]  # chip-sequential
"""

from __future__ import annotations

import math
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_denoising_filter_tpu.config import NlmParams, TilingConfig
    from image_denoising_filter_tpu.ops import nlm_accumulate_frames, normalize
    from image_denoising_filter_tpu.utils import chiptime, compile_cache
    from image_denoising_filter_tpu.utils.content import synthetic_render_expr

    compile_cache.enable()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    hh, ww, f_n = 1080, 1920, 5
    scene = synthetic_render_expr(hh, ww, seed=1)

    @jax.jit
    def _mk(key):
        clean = scene()
        k1, k2 = jax.random.split(key)
        tgt = (
            clean + 0.05 * jax.random.normal(k1, (hh, ww, 4), jnp.float32)
        ).at[..., 3].set(1.0)
        frames = (
            clean[None]
            + 0.05 * jax.random.normal(k2, (f_n, hh, ww, 4), jnp.float32)
        ).at[..., 3].set(1.0)
        return tgt, frames

    tgt, frames = _mk(jax.random.PRNGKey(5))
    float(tgt[0, 0, 0])  # fence

    bf16 = TilingConfig(compute_dtype="bfloat16")
    nlp = NlmParams(uniform_alpha=True)
    disk7 = NlmParams(uniform_alpha=True, search_stride=2, search_disk=True)
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

    want = normalize(*nlm_accumulate_frames(tgt, frames, nlp))
    for name, cfg in (("disk7", disk7), ("s6hrwdisk", s6hrwdisk)):
        got = normalize(*nlm_accumulate_frames(tgt, frames, cfg, bf16))
        db = psnr(got, want)
        print(
            f"temporal {name}: {db:.2f} dB vs exact 5-frame "
            f"(gate {'OK' if db >= 40 else 'FAIL'})",
            flush=True,
        )

    res = chiptime.ab_compare(
        {
            "disk7": lambda t, fr: normalize(
                *nlm_accumulate_frames(t, fr, disk7, bf16)
            ),
            "s6hrwdisk": lambda t, fr: normalize(
                *nlm_accumulate_frames(t, fr, s6hrwdisk, bf16)
            ),
        },
        tgt,
        frames,
        n_pixels=hh * ww,
        ks=(1, 4, 8),
        rounds=rounds,
    )
    for name in res.names:
        print(
            f"{name}: {res.medians[name] / (hh * ww) * 1e6:.1f} fps median",
            flush=True,
        )


if __name__ == "__main__":
    main()
