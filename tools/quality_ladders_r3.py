"""Reproduce the round-3 quality ladders (CPU-runnable, no chip needed).

Three measured ladders quoted in docs/PERFORMANCE.md:

  1. NLM turbo search-subset ladder: dB vs the exact s=7 NLM for strided /
     trimmed candidate subsets on the bench gate content. (7,2) and (6,2)
     pass the 40 dB gate; (5,2), (6,3), stride 4 fail it.
  2. Bilateral turbo d=8 sigma_spatial crossover at 4K: d=8 passes the gate
     from sigma_s ~5-6 up (the reference default sigma_s=2 keeps it
     published-but-ungated).
  3. Box vs Gaussian pooling prefilter (negative result: Gaussian measures
     worse at equal variance; the box stays).

Run: JAX_PLATFORMS=cpu python tools/quality_ladders_r3.py [--fast]
--fast skips the 4K sigma crossover (the exact 4K bilateral oracle is the
slow part, ~10 min on CPU).
"""

from __future__ import annotations

import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np

from image_denoising_filter_tpu.config import BilateralParams, NlmParams
from image_denoising_filter_tpu.ops import bilateral_fast
from image_denoising_filter_tpu.ops import reference as ref
from image_denoising_filter_tpu.ops.xla import (
    bilateral_xla,
    nlm_xla,
    normalize_xla,
)
from image_denoising_filter_tpu.utils.content import synthetic_render


def gate_content():
    """The bench.py 512x1024 sinusoid gate frames (same seeds/params)."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:512, 0:1024].astype(np.float32)
    clean = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 23.0),
            0.5 + 0.4 * np.cos(xx / 53.0 + yy / 31.0),
            0.5 + 0.3 * np.sin((xx + yy) / 41.0),
            np.ones_like(xx),
        ],
        axis=-1,
    ).astype(np.float32)
    nz = (clean + rng.normal(0, 0.05, clean.shape)).astype(np.float32)
    nz[..., 3] = 1.0
    nz2 = (clean + rng.normal(0, 0.05, clean.shape)).astype(np.float32)
    nz2[..., 3] = 1.0
    return clean, nz, nz2


def noisy_render(h, w, seed=1):
    rng = np.random.default_rng(0)
    img = synthetic_render(h, w, seed=seed)
    img = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    img[..., 3] = 1.0
    return img


def nlm_subset_ladder():
    print("--- NLM turbo search-subset ladder (512x1024 gate content) ---")
    clean, nz, nz2 = gate_content()
    exact = np.asarray(normalize_xla(*nlm_xla(nz, nz2, NlmParams())))
    den_ex = ref.psnr(exact[..., :3], clean[..., :3])
    # (s, stride, disk): disk=True drops grid corners (round-4 screen --
    # (7, 2, disk) keeps 37 candidates and beats the 36-candidate (6, 2)
    # radius trim by ~0.7 dB at the same cost).
    for s, st, disk in (
        (7, 2, False), (6, 2, False), (7, 2, True), (5, 2, False),
        (6, 2, True), (6, 3, False), (7, 3, False), (7, 4, False),
    ):
        p = NlmParams(search_radius=s, search_stride=st, search_disk=disk)
        out = np.asarray(normalize_xla(*nlm_xla(nz, nz2, p)))
        db = ref.psnr(out[..., :3], exact[..., :3])
        den = ref.psnr(out[..., :3], clean[..., :3])
        axis = list(range(s % st - s, s, st))
        n_off = sum(
            1
            for dy in axis
            for dx in axis
            if not disk or dy * dy + dx * dx <= s * s
        )
        mark = "PASS" if db >= 40.0 else "fail"
        print(
            f"  s={s} stride={st}{' disk' if disk else ''}"
            f" ({n_off:3d} offsets): {db:5.1f} dB vs exact"
            f" [{mark}]  denoise {den:.1f} dB (exact {den_ex:.1f})"
        )


def d8_sigma_crossover(h=2160, w=3840):
    print(f"--- bilateral turbo d=8 sigma crossover ({h}x{w} render) ---")
    rz = noisy_render(h, w)
    for ss in (2.0, 4.0, 6.0):
        bp = BilateralParams(sigma_spatial=ss, uniform_alpha=True)
        exact = np.asarray(bilateral_xla(rz, bp))[..., :3]
        for d in (4, 8):
            got = np.asarray(bilateral_fast(rz, bp, 6, d))[..., :3]
            db = ref.psnr(got, exact)
            mark = "PASS" if db >= 40.0 else "fail"
            print(f"  sigma_s={ss} d={d}: {db:5.1f} dB vs exact [{mark}]")


def pool_prefilter_compare():
    """Box vs equal-variance-Gaussian pooling, 512x1024 render (negative
    result summary; full experiment in the round-3 session log)."""
    print("--- pooling prefilter (box is the shipped choice) ---")
    rz = noisy_render(512, 1024)
    bp = BilateralParams(uniform_alpha=True)
    exact = np.asarray(bilateral_xla(rz, bp))[..., :3]
    for d in (4, 8):
        got = np.asarray(bilateral_fast(rz, bp, 6, d))[..., :3]
        print(f"  box d={d}: {ref.psnr(got, exact):.2f} dB vs exact "
              "(Gaussian measured 0.1-0.7 dB WORSE at equal variance)")


if __name__ == "__main__":
    nlm_subset_ladder()
    pool_prefilter_compare()
    if "--fast" not in sys.argv:
        d8_sigma_crossover()
