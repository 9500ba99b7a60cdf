"""Round-4 quality screen: NLM turbo with HALF-RESOLUTION WEIGHTS.

Idea: the per-offset weight field w(x, o) = exp(-boxSSD/h^2) is already a
box-filtered (smooth) quantity; computing it on a 2x-downsampled lattice and
bilinearly upsampling it, while keeping the value taps at FULL resolution,
cuts the dominant per-offset cost (SSD + box + exp, ~17 of the ~22 VPU
ops/offset in the strided kernel) by ~4x. All stride-2 search offsets are
EVEN (the phase-aligned subset includes 0), so they map exactly onto the
half-res lattice. Two variants, increasing fidelity / decreasing speedup:

  V1 "pooled-images": 2x2-mean-pool the target/neighbour RGB, compute the
     per-offset SSD entirely at half res (3x3 half-res box ~= the 6x6
     full-res patch), scale by kappa=4 (matches the SMOOTH-signal SSD; the
     iid-noise SSD component pools down by a further 4x, so weights
     discriminate noise LESS -- the screen decides if that costs dB).
     Estimated ~2x over the shipped strided kernel.
  V2 "pooled-E": the per-pixel squared-difference image E is computed at
     full res (exact), then 2x2-mean-pooled; 4 * (3x3 box of pooled E)
     equals the EXACT 6x6 full-res SSD at even output positions, so the
     weight field is exact on the half lattice and only the odd rows/cols
     are interpolated. Estimated ~1.3x.
  V1R "rows-pooled": pool ROWS only (2x1), kappa=2, 3-row x 2p-lane box,
     row-only bilinear upsample. Same VPU savings class as V1 in the Pallas
     kernel (the per-offset upsample becomes ONE small banded bf16 MXU dot
     -- the slice kernels' proven pattern -- with no lane-interleave, which
     Mosaic has no cheap primitive for), and strictly LESS pooling than V1,
     so quality should dominate it. This is the variant the Pallas kernel
     implements (stencils.py weights_halfres mode).

Both keep the exact taps, stride importance compensation, and norm-seed
semantics of ops/xla.py:nlm_xla (shaders/nonlocal.comp:30-65 parity chain).

Run: JAX_PLATFORMS=cpu python tools/nlm_hrw_screen_r4.py
A >= 40 dB PASS on both gate contents queues a Pallas implementation + chip
A/B; a fail is a documented negative result (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import functools

import jax.numpy as jnp
import numpy as np

from image_denoising_filter_tpu.config import NlmParams
from image_denoising_filter_tpu.ops import reference as ref
from image_denoising_filter_tpu.ops.xla import _pad2d, nlm_xla, normalize_xla
from image_denoising_filter_tpu.utils.content import synthetic_render


def _pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean-pool over the leading two axes (must be even-sized)."""
    h, w = x.shape[0] // 2, x.shape[1] // 2
    x = x.reshape((h, 2, w, 2) + x.shape[2:])
    return x.mean(axis=(1, 3))


def _up_centers(wh: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear upsample with half-pixel centers (V1: pooled cell i holds
    rows 2i..2i+1, sample point y = 2i + 0.5)."""
    return jax.image.resize(wh, (h, w), method="linear", antialias=False)


def _up_even(wh: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear upsample anchored at EVEN positions (V2: wh[i] is exact at
    output row 2i; odd rows average neighbours, clamped at the end)."""

    def axis_up(v):  # along axis 0
        nxt = jnp.concatenate([v[1:], v[-1:]], axis=0)
        odd = 0.5 * (v + nxt)
        out = jnp.stack([v, odd], axis=1)  # (n, 2, ...)
        return out.reshape((v.shape[0] * 2,) + v.shape[1:])

    out = axis_up(wh)[:h]
    out = jnp.swapaxes(axis_up(jnp.swapaxes(out, 0, 1))[:w], 0, 1)
    return out


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def nlm_hrw_xla(
    target: jnp.ndarray,
    neighbour: jnp.ndarray,
    params: NlmParams,
    variant: str = "V2",
    kappa: float = 4.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Half-res-weights NLM accumulation partials (prototype, jnp only)."""
    assert params.search_stride == 2, "offsets must be even"
    target = target.astype(jnp.float32)
    neighbour = neighbour.astype(jnp.float32)
    h, w, _ = target.shape
    s, p = params.search_radius, params.patch_radius
    halo = s + p
    pn = _pad2d(neighbour, halo, params.border)
    inv_h2 = jnp.float32(1.0 / (params.h**2))

    st = params.search_stride
    sy, sx = np.mgrid[s % st : 2 * s : st, s % st : 2 * s : st]
    offs_np = np.stack([sy.ravel(), sx.ravel()], axis=1).astype(np.int32)
    if params.search_disk:
        keep = (offs_np[:, 0] - s) ** 2 + (offs_np[:, 1] - s) ** 2 <= s * s
        offs_np = offs_np[keep]
    offs = jnp.asarray(offs_np)

    h2, w2 = h // 2, w // 2
    if variant == "V1R":
        # Rows-only (2x1) pooling, kappa=2, window (3, 2p), row-upsample.
        # Geometry mirrors the planned Pallas mode exactly: w_half cells
        # ih in [-1, h2+1); ssd_h(ih) = sum_{a=-1..1} Eh(ih+a) boxed over
        # 2p lanes; Eh(ih, x) = mean over rows {2ih, 2ih+1} of the
        # per-pixel squared diff. Upsample with half-pixel centers:
        # out[2i] = 0.25 c[i-1] + 0.75 c[i]; out[2i+1] = 0.75 c[i] + 0.25 c[i+1].
        big = 2 * ((s + p) // 2 + 4)
        tpad = _pad2d(target, big, params.border)[..., :3]
        npad = _pad2d(neighbour, big, params.border)[..., :3]

        def pool_rows(x, ih0, n_rows):
            # half rows [ih0, ih0 + n_rows) -> abs rows [2*ih0, ...)
            blk = jax.lax.dynamic_slice_in_dim(
                x, big + 2 * ih0, 2 * n_rows, axis=0
            )
            return blk.reshape((n_rows, 2) + x.shape[1:]).mean(axis=1)

        # Lane-extended half planes: lanes [-p-s, w+p+s) cover dx + patch.
        lane0, lane_n = big - p - s, w + 2 * (p + s)
        th_rows = h2 + 2 + 4  # w_half cells [-1,h2+1) + box reach 1 (+slack)
        t_half = jax.lax.dynamic_slice_in_dim(
            pool_rows(tpad, -3, th_rows), lane0, lane_n, axis=1
        )
        nh_rows = th_rows + 8  # + offset reach 3 (+slack)
        n_half = jax.lax.dynamic_slice_in_dim(
            pool_rows(npad, -7, nh_rows), lane0, lane_n, axis=1
        )
        # t_half[r] is half-cell ih = r - 3; n_half[r] is ih = r - 7.
        ew = w + 2 * p - 1

        def weights_half_rows(off):
            ohy = (off[0] - s) // 2  # in [-s//2, s//2]
            dx = off[1] - s
            # Eh rows needed: ih in [-2, h2+2); lanes x' in [-p, w+p-1).
            t_e = jax.lax.dynamic_slice(
                t_half, (1, s, 0), (h2 + 4, ew, 3)
            )
            n_e = jax.lax.dynamic_slice(
                n_half, (5 + ohy, s + dx, 0), (h2 + 4, ew, 3)
            )
            d = t_e - n_e
            e = jnp.sum(d * d, axis=-1)
            # 3-row window anchored at ih-1: rows r..r+2 of e give cell r-1.
            ssd3 = e[:-2] + e[1:-1] + e[2:]  # cells ih in [-1, h2+1)
            ssd = jax.lax.reduce_window(
                ssd3, 0.0, jax.lax.add, (1, 2 * p), (1, 1), "valid"
            )
            return jnp.exp(-(kappa * ssd) * inv_h2)  # (h2+2, w)

        def up_rows(wh, hh, ww):
            even = 0.25 * wh[:-2] + 0.75 * wh[1:-1]  # out row 2i from c[i-1],c[i]
            odd = 0.75 * wh[1:-1] + 0.25 * wh[2:]
            out = jnp.stack([even, odd], axis=1).reshape(hh, ww)
            return out

        weights_half = weights_half_rows
        up = lambda wh, hh, ww: up_rows(wh, hh, ww)  # noqa: E731
    elif variant == "V1":
        # Half-res images; SSD entirely at half res.
        tp = _pool2(target[..., :3])
        np_half = _pool2(neighbour[..., :3])
        halo_h = s // 2 + 2  # offset reach s//2 plus 3-box reach 1 (+1 slack)
        pnh = _pad2d(np_half, halo_h, params.border)
        eh2, ew2 = h2 + 2, w2 + 2  # 3-box 'valid' region, start at i-1
        tp_pad = _pad2d(tp, 1, params.border)

        def weights_half(off):
            oh = (off - s) // 2 + halo_h - 1  # start of the (eh2, ew2) slice
            n_ext = jax.lax.dynamic_slice(pnh, (oh[0], oh[1], 0), (eh2, ew2, 3))
            d = tp_pad - n_ext
            e = jnp.sum(d * d, axis=-1)
            ssd = jax.lax.reduce_window(
                e, 0.0, jax.lax.add, (3, 3), (1, 1), "valid"
            )
            return jnp.exp(-(kappa * ssd) * inv_h2)

        up = _up_centers
    else:
        # Full-res E, pooled; exact SSD on the even lattice.
        eh, ew = h + 2 * p - 1, w + 2 * p - 1
        pt = _pad2d(target, p, params.border)[..., :3]
        t_ext = pt[:eh, :ew]
        pn_rgb = pn[..., :3]
        eh_e, ew_e = ((eh + 1) // 2) * 2, ((ew + 1) // 2) * 2

        def weights_half(off):
            n_ext = jax.lax.dynamic_slice(pn_rgb, (off[0], off[1], 0), (eh, ew, 3))
            d = t_ext - n_ext
            e = jnp.sum(d * d, axis=-1)
            e = jnp.pad(e, ((0, eh_e - eh), (0, ew_e - ew)), mode="edge")
            ep = _pool2(e)
            ssd = 4.0 * jax.lax.reduce_window(
                ep, 0.0, jax.lax.add, (3, 3), (1, 1), "valid"
            )
            return jnp.exp(-ssd[:h2, :w2] * inv_h2)

        up = _up_even

    nch = 3 if params.uniform_alpha else 4

    def body(carry, off):
        wc, nw = carry
        wgt = up(weights_half(off), h, w)
        is_self = jnp.logical_and(off[0] == s, off[1] == s)
        wgt = wgt * jnp.where(is_self, 1.0, float(st * st))
        tap = jax.lax.dynamic_slice(pn, (off[0] + p, off[1] + p, 0), (h, w, 4))
        return (wc + tap[..., :nch] * wgt[..., None], nw + wgt), None

    init = (
        jnp.zeros((h, w, nch), jnp.float32),
        jnp.full((h, w), params.norm_seed, jnp.float32),
    )
    (wc, nw), _ = jax.lax.scan(body, init, offs)
    if params.uniform_alpha:
        wc = jnp.concatenate(
            [wc, neighbour[..., 3:] * (nw - params.norm_seed)[..., None]],
            axis=-1,
        )
    return wc, nw


def gate_content():
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


def render_content(h=540, w=960):
    rng = np.random.default_rng(0)
    img = synthetic_render(h, w, seed=1)
    nz = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    nz[..., 3] = 1.0
    nz2 = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)
    nz2[..., 3] = 1.0
    return img, nz, nz2


def main() -> None:
    for name, (clean, nz, nz2) in (
        ("512x1024 sinusoid gate", gate_content()),
        ("540p render", render_content()),
    ):
        print(f"--- NLM half-res-weights screen ({name}) ---")
        exact = np.asarray(normalize_xla(*nlm_xla(nz, nz2, NlmParams())))
        den_ex = ref.psnr(exact[..., :3], clean[..., :3])
        for label, p in (
            ("s=7 st=2      ", NlmParams(search_radius=7, search_stride=2)),
            ("s=7 st=2 disk ", NlmParams(search_radius=7, search_stride=2, search_disk=True)),
        ):
            base = np.asarray(normalize_xla(*nlm_xla(nz, nz2, p)))
            db_b = ref.psnr(base[..., :3], exact[..., :3])
            print(f"  {label} full-res weights: {db_b:5.1f} dB vs exact "
                  f"(denoise {ref.psnr(base[..., :3], clean[..., :3]):.1f}, exact {den_ex:.1f})")
            for variant in ("V2", "V1", "V1R"):
                kappas = {
                    "V2": (4.0,),
                    "V1R": (2.0,),  # rows-only pooling: 18 half cells ~ 36 taps
                    "V1": (4.0, 6.0, 8.0),
                }[variant]
                for kappa in kappas:
                    out = np.asarray(
                        normalize_xla(*nlm_hrw_xla(nz, nz2, p, variant, kappa))
                    )
                    db = ref.psnr(out[..., :3], exact[..., :3])
                    den = ref.psnr(out[..., :3], clean[..., :3])
                    mark = "PASS" if db >= 40.0 else "fail"
                    ktag = f" kappa={kappa:g}" if variant == "V1" else ""
                    print(f"  {label} {variant}{ktag}: {db:5.1f} dB vs exact "
                          f"[{mark}]  denoise {den:.1f}")


if __name__ == "__main__":
    main()
