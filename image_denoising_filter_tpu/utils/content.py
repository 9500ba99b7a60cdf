"""Synthetic render-like benchmark content.

The reference's workload is denoising Monte-Carlo renders (CornellBox /
Bathroom01 / WasteWhite animation frames, Animations/README.md:1): piecewise-
smooth surfaces, hard geometric edges, soft shading gradients -- locally
low-dynamic-range content. This generator produces a deterministic scene with
those statistics so benchmarks and quality gates can run on the content class
the framework targets without shipping binary assets. Full-range iid noise
remains the published worst case (see bench.py): it is NOT what a denoiser
denoises, and grid methods are content-dependent by design.
"""

from __future__ import annotations

import numpy as np


def synthetic_render(h: int, w: int, seed: int = 0) -> np.ndarray:
    """A deterministic render-like RGBA float32 scene in [0, 1].

    Composition: a vertically-shaded background (soft gradient), a set of
    overlapping rectangles and disks with flat-ish albedos and per-surface
    shading gradients (hard edges between them), plus low-amplitude texture.
    Alpha is 1 (opaque LDR render). Noise is NOT added here -- callers add
    the noise they want to denoise.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yn, xn = yy / max(h - 1, 1), xx / max(w - 1, 1)

    # Background: cornell-style wall gradient, slightly colored.
    base = np.stack(
        [
            0.35 + 0.25 * yn,
            0.30 + 0.20 * yn,
            0.28 + 0.15 * yn,
        ],
        axis=-1,
    )

    # Opaque geometric surfaces: rectangles and disks with flat albedo +
    # a per-surface shading gradient (what a lit diffuse surface looks like).
    for _ in range(12):
        albedo = rng.uniform(0.1, 0.9, 3).astype(np.float32)
        gdir = rng.uniform(-1, 1, 2).astype(np.float32)
        gmag = rng.uniform(0.05, 0.25)
        shade = gmag * (gdir[0] * yn + gdir[1] * xn)
        if rng.uniform() < 0.5:
            y0, x0 = rng.uniform(0, 0.8, 2)
            dy, dx = rng.uniform(0.1, 0.45, 2)
            mask = (yn >= y0) & (yn < y0 + dy) & (xn >= x0) & (xn < x0 + dx)
        else:
            cy, cx = rng.uniform(0.1, 0.9, 2)
            r = rng.uniform(0.05, 0.25)
            aspect = w / max(h, 1)
            mask = ((yn - cy) ** 2 + ((xn - cx) / max(aspect, 1e-3) * 1.0) ** 2) < r * r
        surf = np.clip(albedo[None, None] + shade[..., None], 0.0, 1.0)
        base = np.where(mask[..., None], surf, base)

    # Low-amplitude texture (fine detail a denoiser must not flatten).
    tex = 0.02 * np.sin(xx / 3.1) * np.cos(yy / 4.7)
    rgb = np.clip(base + tex[..., None], 0.0, 1.0).astype(np.float32)

    # Anti-aliasing: real renders rasterize with pixel filtering (multi-sample
    # AA / reconstruction filters), so geometric edges span 1-2 px. A small
    # separable blur models that; infinitely hard edges would make this
    # harsher than any real frame.
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for axis in (0, 1):
        pad = [(1, 1) if a == axis else (0, 0) for a in range(3)]
        p = np.pad(rgb, pad, mode="edge")
        sl = [slice(None)] * 3
        acc = np.zeros_like(rgb)
        for t in range(3):
            sl[axis] = slice(t, t + rgb.shape[axis])
            acc += k[t] * p[tuple(sl)]
        rgb = acc
    rgb = rgb.astype(np.float32)
    alpha = np.ones((h, w, 1), np.float32)
    return np.concatenate([rgb, alpha], axis=-1)
