"""Pallas TPU stencil kernels: bilateral, layer-guided cross-bilateral, NLM,
and the normalize epilogue.

These are the TPU-native re-design of the reference's five compute shaders
(shaders/bialteral.comp, bialteral_linear.comp, bialteral_layers.comp,
nonlocal.comp, normalize.comp). Instead of a 16x16 workgroup per pixel block
re-fetching every tap from texture memory, each kernel:

  * grids over (tile_h x tile_w) output tiles;
  * DMAs the tile plus its stencil halo from HBM into a VMEM scratch buffer
    once. Mosaic requires HBM slices to be tiling-aligned, so the halo is
    rounded up: rows to a multiple of 4 (so 2*halo is sublane-aligned), lanes
    to a multiple of 128; the image is pre-padded host-side per the border
    policy so in-kernel indexing is branch-free;
  * walks the row offsets with a roll-carry: the VMEM tile is carried through
    the fori_loop and cyclically rolled up one row per iteration, so every
    slice in the loop body is *static* (Mosaic cannot prove alignment of
    arbitrary dynamic sublane offsets). Column offsets are a static unrolled
    loop of lane-shifted slices;
  * fuses the spatial and color Gaussians into a single exp per tap
    (algebraically identical to the reference's two exps and sqrt-then-square);
  * for NLM, uses the offset decomposition: per search offset, the patch SSD is
    a 2p x 2p separable box sum of a per-pixel squared-difference image --
    identical math to the quadruple loop at ~10x fewer flops.

Layout: images are handled planar (4, H, W) float32 -- channels first, W on the
128-lane axis -- the TPU analog of the reference's "tiled optimal" texture
layout. The "linear" layout variant lives in ops/xla.py.

All public functions take/return (H, W, 4) float32 arrays (transposed
internally) so they are drop-in interchangeable with ops/reference.py and
ops/xla.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (
    BilateralParams,
    BorderPolicy,
    LayersParams,
    NlmParams,
    NormalizeParams,
    TilingConfig,
)

DEFAULT_TILE_H = 64  # round-2 sweep at 4K: 64x1024 (113 Mpix/s vs 104 at
DEFAULT_TILE_W = 1024  # the round-1 128x512 optimum)
DEFAULT_TILE_H_NLM = 128  # round-2 sweep: 128x2048 (197 vs 177 at 128x1024);
DEFAULT_TILE_W_NLM = 2048  # 256x2048 and 128x3840 exceed the compiler limits

# exp(x) == exp2(x * log2(e)): folding log2(e) into the (compile-time) weight
# constants turns every per-tap exp into a bare exp2, saving the hidden
# scale-multiply inside the exp lowering. Identical math to f32 rounding.
LOG2E = float(np.log2(np.e))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _use_interpret() -> bool:
    """Pallas interpret mode off-TPU (tests run on the CPU backend)."""
    return jax.default_backend() != "tpu"


def _halos(r: int) -> tuple[int, int]:
    """(row_halo, lane_halo) aligned for Mosaic HBM slicing: the row slice size
    tile_h + 2*rh must be sublane (8) aligned and the lane slice size
    tile_w + 2*lh lane (128) aligned."""
    return _round_up(r, 4), _round_up(r, 128)


def _pick_tile(
    h: int,
    w: int,
    tiling: Optional[TilingConfig],
    default_th: int = DEFAULT_TILE_H,
    default_tw: int = DEFAULT_TILE_W,
) -> tuple[int, int]:
    th = tiling.tile_h if tiling and tiling.tile_h else min(_round_up(h, 8), default_th)
    tw = tiling.tile_w if tiling and tiling.tile_w else min(_round_up(w, 128), default_tw)
    assert th % 8 == 0 and tw % 128 == 0, "tile_h must be 8-aligned, tile_w 128-aligned"
    return th, tw


def _to_planar(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(img.astype(jnp.float32), (2, 0, 1))


def _from_planar(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(img, (1, 2, 0))


def _pad_planar(
    img: jnp.ndarray,
    rh: int,
    lh: int,
    border: str,
    grid_h: int,
    th: int,
    grid_w: int,
    tw: int,
) -> jnp.ndarray:
    """Pad (C, H, W) so every tile's halo DMA is in-bounds and aligned:
    row halo rh / lane halo lh on the leading edges, plus tile-alignment slack
    on the trailing edges."""
    _, h, w = img.shape
    extra_h = grid_h * th - h
    extra_w = grid_w * tw - w
    mode = "edge" if border == BorderPolicy.CLAMP else "constant"
    return jnp.pad(
        img,
        ((0, 0), (rh, rh + extra_h), (lh, lh + extra_w)),
        mode=mode,
    )


# ---------------------------------------------------------------------------
# Bilateral (shaders/bialteral.comp) -- also the weight engine for the
# layer-guided variant (shaders/bialteral_layers.comp) via `guide`.
# ---------------------------------------------------------------------------


def _circle_runs(
    radius: int, sigma_spatial: float, truncate_eps: float, max_extra: int = 2
):
    """Static (dy_start, n_rows, half_width) row runs covering the exact
    truncation DISK {dy^2 + dx^2 <= R^2}, R^2 = 2 ss^2 ln(1/eps).

    Spatial-weight truncation is tap-exact: a tap contributes
    w = exp(-0.5 (dy^2+dx^2)/ss^2) * w_color with w_color <= 1, so any tap
    with spatial weight < truncate_eps cannot move the float32-normalized
    output (BilateralParams.truncate_eps). The disk is ~pi/4 of the square
    window the reference iterates (shaders/bialteral.comp:51-53) -- ~505 vs
    41x41=1681 taps at the reference sigma_s=2.0.

    Rows are greedily grouped into contiguous runs whose shared dx half-width
    exceeds no member row's exact width by more than `max_extra` (the slack
    taps are legitimate window taps, merely not droppable): each run becomes
    ONE roll-carried fori_loop with a static dx unroll, keeping the Mosaic
    program a few hundred ops -- a fully tap-unrolled kernel (~4k ops) takes
    the compile service >30 min."""
    import math

    if truncate_eps > 0.0:
        r2_max = 2.0 * sigma_spatial * sigma_spatial * math.log(1.0 / truncate_eps)
    else:
        r2_max = float("inf")
    rows = []
    for dy in range(-radius, radius + 1):
        if dy * dy <= r2_max:
            k = radius if math.isinf(r2_max) else int(math.sqrt(r2_max - dy * dy))
            rows.append((dy, min(radius, k)))
    runs = []
    cur = None  # (dy_start, widths)
    for dy, k in rows:
        if cur is not None:
            merged = cur[1] + [k]
            if max(merged) - min(merged) <= max_extra:
                cur = (cur[0], merged)
                continue
            runs.append((cur[0], len(cur[1]), max(cur[1])))
        cur = (dy, [k])
    if cur is not None:
        runs.append((cur[0], len(cur[1]), max(cur[1])))
    return runs


def _bilateral_kernel(
    img_hbm,
    guide_hbm,
    out_wc_ref,
    out_nw_ref,
    img_tile,
    guide_tile,
    sem,
    *,
    runs,
    radius: int,
    th: int,
    tw: int,
    rh: int,
    lh: int,
    inv_ss2: float,
    inv2sc: float,
    blue_bug: bool,
    guided: bool,
    fuse_normalize: bool,
    uniform_alpha: bool,
    cdtype,
):
    """Disk-masked tap walk as a small sequence of roll-carried fori_loops.

    Each run (dy_start, n_rows, half_width) from _circle_runs is one fori over
    its rows: the channel planes are pre-rolled so every in-loop slice is
    static (Mosaic cannot prove alignment of dynamic sublane offsets), and the
    dx sweep is a static unroll of the run's width. Per-channel 2D planes,
    never a sliced 3D slab -- slicing a 3D value makes Mosaic relayout the
    whole slab per access, measured 43x slower."""
    i, j = pl.program_id(0), pl.program_id(1)
    rows = pl.ds(i * th, th + 2 * rh)
    cols = pl.ds(j * tw, tw + 2 * lh)
    cp = pltpu.make_async_copy(img_hbm.at[:, rows, cols], img_tile, sem.at[0])
    cp.start()
    if guided:
        cpg = pltpu.make_async_copy(guide_hbm.at[:, rows, cols], guide_tile, sem.at[1])
        cpg.start()
        cpg.wait()
    cp.wait()

    vimg = [img_tile[c].astype(cdtype) if c < 3 else img_tile[c] for c in range(4)]
    vg = [guide_tile[c].astype(cdtype) for c in range(3)] if guided else None
    wsrc_base = vg if guided else vimg

    # Center pixels (weight source): tile-relative (0,0) sits at scratch (rh, lh).
    cr = wsrc_base[0][rh : rh + th, lh : lh + tw]
    cg = wsrc_base[1][rh : rh + th, lh : lh + tw]
    cb = wsrc_base[2][rh : rh + th, lh : lh + tw]

    n_img = 3 if uniform_alpha else 4
    plane_h = th + 2 * rh
    rbase = rh - radius  # static slice base; roll supplies the row offset

    def pre_roll(v, p):
        return pltpu.roll(v, (plane_h - p) % plane_h, axis=0) if p % plane_h else v

    zero = jnp.zeros((th, tw), jnp.float32)
    accs = (zero, zero, zero, zero, zero)

    for dy0, n_rows, hw in runs:
        cbase = lh - hw
        shift = dy0 + radius  # iteration i reads absolute row rh + dy0 + i

        def row_body(t, carry, dy0=dy0, hw=hw, cbase=cbase):
            wc0, wc1, wc2, wc3, nw = carry[:5]
            vimg_r = carry[5 : 5 + n_img]
            vg_r = carry[5 + n_img :]
            wsrc = vg_r if guided else vimg_r
            fy = (t + dy0).astype(jnp.float32)
            row_term = jnp.float32(-0.5 * inv_ss2 * LOG2E) * fy * fy
            for dx in range(2 * hw + 1):
                col_term = np.float32(-0.5 * inv_ss2 * (dx - hw) ** 2 * LOG2E)
                c0 = cbase + dx
                gr = wsrc[0][rbase : rbase + th, c0 : c0 + tw]
                gg = wsrc[1][rbase : rbase + th, c0 : c0 + tw]
                dr = cr - gr
                dg = cg - gg
                ssd = dr * dr + dg * dg
                gb = wsrc[2][rbase : rbase + th, c0 : c0 + tw]
                if not blue_bug:
                    db = cb - gb
                    ssd = ssd + db * db
                wgt = jnp.exp2(
                    (row_term + col_term)
                    - ssd.astype(jnp.float32) * jnp.float32(inv2sc * LOG2E)
                )
                if guided:
                    t0 = vimg_r[0][rbase : rbase + th, c0 : c0 + tw]
                    t1 = vimg_r[1][rbase : rbase + th, c0 : c0 + tw]
                    t2 = vimg_r[2][rbase : rbase + th, c0 : c0 + tw]
                else:
                    t0, t1, t2 = gr, gg, gb
                wc0 = wc0 + t0.astype(jnp.float32) * wgt
                wc1 = wc1 + t1.astype(jnp.float32) * wgt
                wc2 = wc2 + t2.astype(jnp.float32) * wgt
                if not uniform_alpha:
                    t3 = vimg_r[3][rbase : rbase + th, c0 : c0 + tw]
                    wc3 = wc3 + t3 * wgt
                nw = nw + wgt
            rolled = tuple(
                pltpu.roll(v, v.shape[0] - 1, axis=0) for v in (*vimg_r, *vg_r)
            )
            return (wc0, wc1, wc2, wc3, nw, *rolled)

        init = (
            *accs,
            *(pre_roll(vimg[c], shift) for c in range(n_img)),
            *((pre_roll(vg[c], shift) for c in range(3)) if guided else ()),
        )
        out = jax.lax.fori_loop(0, n_rows, row_body, init)
        accs = out[:5]

    wc0, wc1, wc2, wc3, nw = accs
    if uniform_alpha:
        # sum(w * a) == a * sum(w) when alpha is one constant everywhere.
        wc3 = img_tile[3, rh : rh + th, lh : lh + tw] * nw
    if fuse_normalize:
        # NOTE: the VPU has no exact divider -- x/nw lowers to a Newton-
        # Raphson reciprocal, so x/x can land 1 ulp under 1.0 and the
        # unclamped 255*x truncation cast then yields 254 for a constant-1.0
        # channel. GLSL division carries the same 2.5-ulp Vulkan tolerance
        # (the reference's own GPU output is hardware-dependent here); use
        # imageio.quantize(clamp=True) when exact 255s matter.
        out_wc_ref[0] = wc0 / nw
        out_wc_ref[1] = wc1 / nw
        out_wc_ref[2] = wc2 / nw
        out_wc_ref[3] = wc3 / nw
    else:
        out_wc_ref[0] = wc0
        out_wc_ref[1] = wc1
        out_wc_ref[2] = wc2
        out_wc_ref[3] = wc3
    out_nw_ref[0] = nw


def _bilateral_planar(
    img: jnp.ndarray,
    guide: Optional[jnp.ndarray],
    params: BilateralParams,
    tiling: Optional[TilingConfig],
    fuse_normalize: bool,
):
    _, h, w = img.shape
    # Spatial-weight truncation: taps beyond effective_radius have weight
    # < truncate_eps and cannot change the float32 output (config.py).
    r = params.effective_radius
    rh, lh = _halos(r)
    th, tw = _pick_tile(h, w, tiling)
    grid = (pl.cdiv(h, th), pl.cdiv(w, tw))
    padded = _pad_planar(img, rh, lh, params.border, grid[0], th, grid[1], tw)
    guided = guide is not None
    padded_g = (
        _pad_planar(guide, rh, lh, params.border, grid[0], th, grid[1], tw)
        if guided
        else jnp.zeros((4, 8, 128), jnp.float32)
    )

    runs = _circle_runs(r, params.sigma_spatial, params.truncate_eps)
    cdtype = jnp.bfloat16 if (
        tiling and tiling.compute_dtype == "bfloat16"
    ) else jnp.float32
    kernel = functools.partial(
        _bilateral_kernel,
        runs=runs,
        radius=r,
        th=th,
        tw=tw,
        rh=rh,
        lh=lh,
        inv_ss2=1.0 / (params.sigma_spatial**2),
        inv2sc=0.5 / (params.sigma_color**2),
        blue_bug=params.blue_bug,
        guided=guided,
        fuse_normalize=fuse_normalize,
        uniform_alpha=params.uniform_alpha,
        cdtype=cdtype,
    )
    tile_shape = (4, th + 2 * rh, tw + 2 * lh)
    n_taps = sum(n * (2 * hw + 1) for _, n, hw in runs)
    wc, nw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((4, th, tw), lambda i, j: (0, i, j)),
            pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, h, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(tile_shape, jnp.float32),
            pltpu.VMEM(tile_shape if guided else (4, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_taps * 16 * h * w,
            bytes_accessed=4 * h * w * 4 * (3 if guided else 2),
            transcendentals=n_taps * h * w,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(padded, padded_g)
    return wc, nw


@functools.partial(jax.jit, static_argnums=(1, 2))
def bilateral(
    img: jnp.ndarray,
    params: BilateralParams = BilateralParams(),
    tiling: Optional[TilingConfig] = None,
) -> jnp.ndarray:
    """Bilateral filter, tiled-layout Pallas kernel (shaders/bialteral.comp).

    img: (H, W, 4) float32. Returns the filtered (H, W, 4) image (the
    normalization is fused -- the reference's plain-bilateral path also
    normalizes in-kernel, bialteral.comp:72).
    """
    out, _ = _bilateral_planar(_to_planar(img), None, params, tiling, True)
    return _from_planar(out)


@functools.partial(jax.jit, static_argnums=(2, 3))
def cross_bilateral_layers(
    target: jnp.ndarray,
    layer: jnp.ndarray,
    params: LayersParams = LayersParams(),
    tiling: Optional[TilingConfig] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One layer's cross-bilateral accumulation partials
    (shaders/bialteral_layers.comp): weights from `layer` (the G-buffer guide),
    colors from `target`. Returns (weightColor (H,W,4), normWeight (H,W))."""
    wc, nw = _bilateral_planar(
        _to_planar(target), _to_planar(layer), params, tiling, False
    )
    return _from_planar(wc), nw[0]


# ---------------------------------------------------------------------------
# Non-local means (shaders/nonlocal.comp)
# ---------------------------------------------------------------------------


def _box_lanes(x: jnp.ndarray, k: int, out_w: int) -> jnp.ndarray:
    """Sliding-window sum of width k along lanes via shift doubling:
    out[:, j] = sum_{b<k} x[:, j+b] in ceil(log2 k) + popcount(k) - 1 adds
    (3 for k=6) instead of the naive k-1 (5 for k=6)."""
    sums = {1: x}
    w = 1
    while 2 * w <= k:
        prev = sums[w]
        length = prev.shape[1]
        sums[2 * w] = prev[:, : length - w] + prev[:, w:length]
        w *= 2
    rem, off, acc = k, 0, None
    while rem:
        w = 1 << (rem.bit_length() - 1)
        part = sums[w][:, off : off + out_w]
        acc = part if acc is None else acc + part
        off += w
        rem -= w
    return acc


def _box_rows(x: jnp.ndarray, k: int, out_h: int) -> jnp.ndarray:
    """Sliding-window sum of width k along rows (sublanes), shift doubling."""
    sums = {1: x}
    w = 1
    while 2 * w <= k:
        prev = sums[w]
        length = prev.shape[0]
        sums[2 * w] = prev[: length - w] + prev[w:length]
        w *= 2
    rem, off, acc = k, 0, None
    while rem:
        w = 1 << (rem.bit_length() - 1)
        part = sums[w][off : off + out_h]
        acc = part if acc is None else acc + part
        off += w
        rem -= w
    return acc


def _nlm_kernel(
    tgt_hbm,
    nbr_hbm,
    valid_ref,
    out_wc_ref,
    out_nw_ref,
    tgt_tile,
    nbr_tile,
    sem,
    *,
    s: int,
    p: int,
    th: int,
    tw: int,
    rht: int,
    lht: int,
    rhn: int,
    lhn: int,
    inv_h2: float,
    norm_seed: float,
    uniform_alpha: bool,
    stride: int,
    sdx_steps: tuple,
    cdtype,
):
    """Frame-batched NLM accumulation. Grid (gh, gw, F): the frame axis is the
    innermost (sequential) grid dimension, so the (weightColor, normWeight)
    output blocks stay VMEM-resident across all frames of a tile -- the TPU
    analog of the reference's persistent device-local weights buffer
    (src/main.cpp:1430-1433, shaders/nonlocal.comp:61-62) -- instead of a
    per-frame HBM round-trip of the partials.

    `sdx_steps[step]` is the static tuple of sdx (padded-column) candidates
    evaluated at search-row `step`. Uniform rows (no disk trim) compile to
    the single fori_loop of rounds 2-3; the disk trim
    (config.NlmParams.search_disk) groups consecutive rows with identical
    column subsets into segmented fori_loops sharing the roll-carry, so
    corner candidates cost nothing rather than being masked."""
    halo = s + p
    i, j, f = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(f == 0)
    def _load_target():
        cpt = pltpu.make_async_copy(
            tgt_hbm.at[:, pl.ds(i * th, th + 2 * rht), pl.ds(j * tw, tw + 2 * lht)],
            tgt_tile,
            sem.at[0],
        )
        cpt.start()
        cpt.wait()

    cpn = pltpu.make_async_copy(
        nbr_hbm.at[f, :, pl.ds(i * th, th + 2 * rhn), pl.ds(j * tw, tw + 2 * lhn)],
        nbr_tile,
        sem.at[1],
    )
    cpn.start()
    cpn.wait()

    # E (per-pixel squared diff) region: (eh, ew) starting at tile-relative
    # (-p, -p). In target scratch coords that's (rht - p, lht - p); in the
    # *rolled* neighbour value at search step sdy it starts at row
    # (rhn - halo), lane (lhn - halo) + sdx (see ops/xla.py:nlm_xla for the
    # index derivation; the roll-carry absorbs sdy).
    eh, ew = th + 2 * p - 1, tw + 2 * p - 1
    t0 = tgt_tile[0, rht - p : rht - p + eh, lht - p : lht - p + ew].astype(cdtype)
    t1 = tgt_tile[1, rht - p : rht - p + eh, lht - p : lht - p + ew].astype(cdtype)
    t2 = tgt_tile[2, rht - p : rht - p + eh, lht - p : lht - p + ew].astype(cdtype)

    # Strided (approximate) mode keeps the zero offset in the subset: start
    # the sweep at s % stride so sdy == s (d == 0) is always hit. Non-self
    # offsets get an importance-sampling weight compensation of stride^2
    # (folded into the exp argument as a log bias, zero extra vector ops).
    start = s % stride
    log_m = float(np.log2(float(stride * stride)))  # exp2-domain bias
    k0 = (s - start) // stride  # fori step where sdy == s
    erow = rhn - halo + start
    ecol = lhn - halo
    trow = rhn - s + start  # tap center row: erow + p
    tcol = lhn - s
    n_carry = 3 if uniform_alpha else 4

    def make_row_body(sdx_list):
        return functools.partial(row_body, sdx_list=sdx_list)

    def row_body(step, carry, *, sdx_list):
        wc0, wc1, wc2, wc3, nw = carry[:5]
        vn = carry[5:]  # neighbour planes, rolled up step*stride rows
        for sdx in sdx_list:
            c0 = ecol + sdx
            n0 = vn[0][erow : erow + eh, c0 : c0 + ew]
            n1 = vn[1][erow : erow + eh, c0 : c0 + ew]
            n2 = vn[2][erow : erow + eh, c0 : c0 + ew]
            d0 = t0 - n0.astype(cdtype)
            d1 = t1 - n1.astype(cdtype)
            d2 = t2 - n2.astype(cdtype)
            e = (d0 * d0 + d1 * d1 + d2 * d2).astype(jnp.float32)
            # Separable 2p x 2p box sum of e -> patch SSD per tile pixel
            # (log-tree sliding sums, rows then lanes).
            ssd = _box_lanes(_box_rows(e, 2 * p, th), 2 * p, tw)
            arg = ssd * jnp.float32(-inv_h2 * LOG2E)
            if stride > 1:
                if sdx == s:  # d_x == 0: self-match only where d_y == 0 too
                    bias = jnp.where(
                        step == k0, jnp.float32(0.0), jnp.float32(log_m)
                    )
                else:
                    bias = jnp.float32(log_m)
                arg = arg + bias
            wgt = jnp.exp2(arg)
            tc = tcol + sdx
            c0v = vn[0][trow : trow + th, tc : tc + tw]
            c1v = vn[1][trow : trow + th, tc : tc + tw]
            c2v = vn[2][trow : trow + th, tc : tc + tw]
            wc0 = wc0 + c0v * wgt
            wc1 = wc1 + c1v * wgt
            wc2 = wc2 + c2v * wgt
            if not uniform_alpha:
                c3v = vn[3][trow : trow + th, tc : tc + tw]
                wc3 = wc3 + c3v * wgt
            nw = nw + wgt
        rolled = tuple(
            pltpu.roll(v, v.shape[0] - stride, axis=0) for v in vn
        )
        return (wc0, wc1, wc2, wc3, nw, *rolled)

    n_steps = len(sdx_steps)
    zero = jnp.zeros((th, tw), jnp.float32)
    seed = jnp.full((th, tw), norm_seed, jnp.float32)
    out = (zero, zero, zero, zero, seed, *(nbr_tile[c] for c in range(n_carry)))
    # Segmented fori loops: consecutive search rows with the same column
    # subset share one compiled body; uniform subsets collapse to one loop.
    a = 0
    while a < n_steps:
        b = a
        while b < n_steps and sdx_steps[b] == sdx_steps[a]:
            b += 1
        out = jax.lax.fori_loop(a, b, make_row_body(sdx_steps[a]), out)
        a = b
    wc0, wc1, wc2, wc3, nw = out[:5]
    if uniform_alpha:
        # This frame's tap alphas are one constant a: sum(w * a) = a * (nw -
        # seed); the seed is not alpha-weighted (shaders/nonlocal.comp:32, 61).
        # Reconstructed per frame, so frames with different constants stay
        # exact.
        alpha = nbr_tile[3, rhn : rhn + th, lhn : lhn + tw]
        wc3 = alpha * (nw - jnp.float32(norm_seed))

    # Frame validity mask (sharded temporal path pads the frame axis to the
    # mesh's 'frame' size): a masked frame contributes neither weights nor
    # its norm seed -- same semantics as the scan path's `partial * v`.
    v = valid_ref[f]
    wc0 = wc0 * v
    wc1 = wc1 * v
    wc2 = wc2 * v
    wc3 = wc3 * v
    nw = nw * v

    @pl.when(f == 0)
    def _init_out():
        out_wc_ref[0] = wc0
        out_wc_ref[1] = wc1
        out_wc_ref[2] = wc2
        out_wc_ref[3] = wc3
        out_nw_ref[0] = nw

    @pl.when(f != 0)
    def _accum_out():
        out_wc_ref[0] += wc0
        out_wc_ref[1] += wc1
        out_wc_ref[2] += wc2
        out_wc_ref[3] += wc3
        out_nw_ref[0] += nw


NLM_HRW_KAPPA = 2.0  # 3 x 2p half cells stand in for the 2p x 2p full box


def _nlm_hrw_kernel(
    tgt_hbm,
    nbr_hbm,
    valid_ref,
    pt_ref,
    pn_ref,
    vup_ref,
    out_wc_ref,
    out_nw_ref,
    tgt_tile,
    nbr_tile,
    sem,
    *,
    s: int,
    p: int,
    th: int,
    tw: int,
    rht: int,
    lht: int,
    rhn: int,
    lhn: int,
    inv_h2: float,
    norm_seed: float,
    uniform_alpha: bool,
    stride: int,
    sdx_steps: tuple,
    cdtype,
):
    """Frame-batched NLM with HALF-ROW-RESOLUTION weights
    (config.NlmParams.weights_halfres; algorithm spec + quality screen:
    tools/nlm_hrw_screen_r4.py, oracle: ops/xla.py:nlm_xla halfres branch).

    Same tile/DMA/accumulator structure as _nlm_kernel; what changes is the
    weight path. Per frame the 3 RGB scratch planes are 2x1-mean-pooled by a
    banded matmul (MXU; pool matrices ride in as inputs, exact in bf16), the
    per-candidate squared-diff/3-row-box/exp runs on the half-row lattice
    (half the VPU work of the full-res weight path), and each candidate's
    weight field is upsampled back to tile rows by ONE small banded matmul
    with the d=2 bilinear matrix (vup) -- MXU work off the VPU critical
    path, the same pattern the turbo slice kernels use for grid upsampling.
    Value taps stay full-resolution (the full planes ride the same
    roll-carry as _nlm_kernel); dy offsets are even (stride 2), so each
    candidate lands exactly on the half lattice and the pooled planes roll
    by ONE row per search step.

    Pooling pairs scratch rows (2r, 2r+1): tile starts (i*th) and both halos
    (rht, rhn) are even, so the pairs sit on the absolute even-row lattice --
    identical to the XLA oracle's global pooling. Sharded callers note: a
    shard whose local row offset is odd would shift this lattice by one row
    (still a valid approximation, but not bitwise-equal to single-device);
    parallel.spatial._check_hrw_lattice REFUSES such partitions (odd
    rows-per-shard or odd s+p halo) so the approximation never silently
    changes with the mesh shape."""
    halo = s + p
    th2 = th // 2
    i, j, f = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(f == 0)
    def _load_target():
        cpt = pltpu.make_async_copy(
            tgt_hbm.at[:, pl.ds(i * th, th + 2 * rht), pl.ds(j * tw, tw + 2 * lht)],
            tgt_tile,
            sem.at[0],
        )
        cpt.start()
        cpt.wait()

    cpn = pltpu.make_async_copy(
        nbr_hbm.at[f, :, pl.ds(i * th, th + 2 * rhn), pl.ds(j * tw, tw + 2 * lhn)],
        nbr_tile,
        sem.at[1],
    )
    cpn.start()
    cpn.wait()

    ptm = pt_ref[:]  # (th2 + rht, th + 2*rht): target row-pool bands
    pnm = pn_ref[:]  # (th2 + rhn, th + 2*rhn): neighbour row-pool bands
    vup = vup_ref[:]  # (th, th2 + 2): x2 bilinear row upsample bands

    ew = tw + 2 * p - 1
    # Pooled target cells ih in [-rht/2, th2 + rht/2); the weight path needs
    # exactly ih in [-2, th2+2) (rht == 4). Lanes: E region starts at x' = -p.
    t_e = tuple(
        jnp.dot(
            ptm, tgt_tile[c].astype(ptm.dtype), preferred_element_type=jnp.float32
        ).astype(cdtype)[:, lht - p : lht - p + ew]
        for c in range(3)
    )
    # Pooled neighbour planes, cells ih in [-rhn/2, th2 + rhn/2). Carried
    # (and rolled) in f32 like _nlm_kernel's full-res planes -- Mosaic's
    # dynamic_rotate has no bf16 lowering ("Rotate with non-32-bit data"), so
    # the cdtype cast happens per-candidate at the slice, not on the carry.
    nh0 = tuple(
        jnp.dot(
            pnm, nbr_tile[c].astype(pnm.dtype), preferred_element_type=jnp.float32
        )
        for c in range(3)
    )

    start = s % stride
    log_m = float(np.log2(float(stride * stride)))
    k0 = (s - start) // stride
    # First step's half-row shift: dy0 = start - s (even); fixed slice start
    # in the rolled pooled planes: cell ih = -2 at buffer row
    # rhn/2 + dy0/2 - 2; each step rolls the pooled planes up by 1.
    erow_h = rhn // 2 + (start - s) // 2 - 2
    ecol = lhn - halo
    trow = rhn - s + start
    tcol = lhn - s
    n_carry = 3 if uniform_alpha else 4
    kscale = jnp.float32(-inv_h2 * NLM_HRW_KAPPA * LOG2E)

    def make_row_body(sdx_list):
        return functools.partial(row_body, sdx_list=sdx_list)

    def row_body(step, carry, *, sdx_list):
        wc0, wc1, wc2, wc3, nw = carry[:5]
        vn = carry[5 : 5 + n_carry]  # full-res planes (taps), roll = stride
        vh = carry[5 + n_carry :]  # pooled planes (weights), roll = 1
        for sdx in sdx_list:
            c0 = ecol + sdx
            n0 = vh[0][erow_h : erow_h + th2 + 4, c0 : c0 + ew]
            n1 = vh[1][erow_h : erow_h + th2 + 4, c0 : c0 + ew]
            n2 = vh[2][erow_h : erow_h + th2 + 4, c0 : c0 + ew]
            d0 = t_e[0] - n0.astype(cdtype)
            d1 = t_e[1] - n1.astype(cdtype)
            d2 = t_e[2] - n2.astype(cdtype)
            e = (d0 * d0 + d1 * d1 + d2 * d2).astype(jnp.float32)
            # 3-row half window anchored at ih-1, then the 2p-lane box.
            e3 = e[:-2] + e[1:-1] + e[2:]  # cells ih in [-1, th2+1)
            ssd = _box_lanes(e3, 2 * p, tw)
            arg = ssd * kscale
            if stride > 1:
                if sdx == s:
                    bias = jnp.where(
                        step == k0, jnp.float32(0.0), jnp.float32(log_m)
                    )
                else:
                    bias = jnp.float32(log_m)
                arg = arg + bias
            wh = jnp.exp2(arg)  # (th2 + 2, tw)
            wgt = jnp.dot(
                vup, wh.astype(vup.dtype), preferred_element_type=jnp.float32
            )  # (th, tw) full-res weights, MXU
            tc = tcol + sdx
            c0v = vn[0][trow : trow + th, tc : tc + tw]
            c1v = vn[1][trow : trow + th, tc : tc + tw]
            c2v = vn[2][trow : trow + th, tc : tc + tw]
            wc0 = wc0 + c0v * wgt
            wc1 = wc1 + c1v * wgt
            wc2 = wc2 + c2v * wgt
            if not uniform_alpha:
                c3v = vn[3][trow : trow + th, tc : tc + tw]
                wc3 = wc3 + c3v * wgt
            nw = nw + wgt
        rolled = tuple(pltpu.roll(v, v.shape[0] - stride, axis=0) for v in vn)
        rolled_h = tuple(pltpu.roll(v, v.shape[0] - 1, axis=0) for v in vh)
        return (wc0, wc1, wc2, wc3, nw, *rolled, *rolled_h)

    n_steps = len(sdx_steps)
    zero = jnp.zeros((th, tw), jnp.float32)
    seed = jnp.full((th, tw), norm_seed, jnp.float32)
    out = (
        zero,
        zero,
        zero,
        zero,
        seed,
        *(nbr_tile[c] for c in range(n_carry)),
        *nh0,
    )
    a = 0
    while a < n_steps:
        b = a
        while b < n_steps and sdx_steps[b] == sdx_steps[a]:
            b += 1
        out = jax.lax.fori_loop(a, b, make_row_body(sdx_steps[a]), out)
        a = b
    wc0, wc1, wc2, wc3, nw = out[:5]
    if uniform_alpha:
        alpha = nbr_tile[3, rhn : rhn + th, lhn : lhn + tw]
        wc3 = alpha * (nw - jnp.float32(norm_seed))

    v = valid_ref[f]
    wc0 = wc0 * v
    wc1 = wc1 * v
    wc2 = wc2 * v
    wc3 = wc3 * v
    nw = nw * v

    @pl.when(f == 0)
    def _init_out():
        out_wc_ref[0] = wc0
        out_wc_ref[1] = wc1
        out_wc_ref[2] = wc2
        out_wc_ref[3] = wc3
        out_nw_ref[0] = nw

    @pl.when(f != 0)
    def _accum_out():
        out_wc_ref[0] += wc0
        out_wc_ref[1] += wc1
        out_wc_ref[2] += wc2
        out_wc_ref[3] += wc3
        out_nw_ref[0] += nw


def _up2_matrix(n_in: int, n_out: int) -> np.ndarray:
    """x2 bilinear row-upsample bands (half-pixel centers): output row y
    samples half cells at g = (y+0.5)/2 - 0.5; input row r holds cell
    ih = r - 1 (the slab starts one cell early for the y=0 tap)."""
    u = np.zeros((n_out, n_in), np.float32)
    for y in range(n_out):
        g = (y + 0.5) / 2.0 - 0.5
        fl = int(np.floor(g))
        w1 = g - fl
        u[y, fl + 1] += 1.0 - w1
        u[y, fl + 2] += w1
    return u


def _pool2_rows_matrix(n_in: int) -> np.ndarray:
    """2x1 mean-pool bands: out row r = 0.5 * (in[2r] + in[2r+1])."""
    m = np.zeros((n_in // 2, n_in), np.float32)
    for r in range(n_in // 2):
        m[r, 2 * r] = 0.5
        m[r, 2 * r + 1] = 0.5
    return m


def _nlm_planar_frames(
    tgt: jnp.ndarray,  # (4, H, W)
    frames: jnp.ndarray,  # (F, 4, H, W)
    params: NlmParams,
    tiling: Optional[TilingConfig],
    valid: Optional[jnp.ndarray] = None,  # (F,) float 0/1 frame mask
) -> tuple[jnp.ndarray, jnp.ndarray]:
    _, h, w = tgt.shape
    n_frames = frames.shape[0]
    if valid is None:
        valid = jnp.ones((n_frames,), jnp.float32)
    s, p = params.search_radius, params.patch_radius
    stride = params.search_stride
    rht, lht = _halos(p)
    rhn, lhn = _halos(s + p)
    th, tw = _pick_tile(h, w, tiling, DEFAULT_TILE_H_NLM, DEFAULT_TILE_W_NLM)
    gh, gw = pl.cdiv(h, th), pl.cdiv(w, tw)
    padded_t = _pad_planar(tgt, rht, lht, params.border, gh, th, gw, tw)
    pad_f = jax.vmap(
        lambda img: _pad_planar(img, rhn, lhn, params.border, gh, th, gw, tw)
    )
    padded_n = pad_f(frames)

    cdtype = jnp.bfloat16 if (
        tiling and tiling.compute_dtype == "bfloat16"
    ) else jnp.float32
    # Per-search-row candidate columns (sdx = dx + s in padded coords); the
    # disk trim drops grid corners per config.NlmParams.search_disk.
    sdx_all = tuple(range(s % stride, 2 * s, stride))
    sdx_steps = tuple(
        tuple(
            sdx
            for sdx in sdx_all
            if not params.search_disk
            or (sdy - s) ** 2 + (sdx - s) ** 2 <= s * s
        )
        for sdy in sdx_all
    )
    kern_kwargs = dict(
        s=s,
        p=p,
        th=th,
        tw=tw,
        rht=rht,
        lht=lht,
        rhn=rhn,
        lhn=lhn,
        inv_h2=1.0 / (params.h**2),
        norm_seed=params.norm_seed,
        uniform_alpha=params.uniform_alpha,
        stride=stride,
        sdx_steps=sdx_steps,
        cdtype=cdtype,
    )
    n_offsets = sum(len(t) for t in sdx_steps)
    if params.weights_halfres:
        # Half-row-resolution weight field (see _nlm_hrw_kernel). The pool /
        # upsample band matrices ride in as VMEM inputs (exact in bf16);
        # per-offset VPU work drops from ~22 to ~14 ops (the row upsample is
        # a small banded MXU dot).
        if stride != 2 or p != 3:
            raise ValueError(
                "weights_halfres requires search_stride=2 and patch_radius=3"
            )
        extra_in = (
            jnp.asarray(_pool2_rows_matrix(th + 2 * rht), cdtype),
            jnp.asarray(_pool2_rows_matrix(th + 2 * rhn), cdtype),
            jnp.asarray(_up2_matrix(th // 2 + 2, th), cdtype),
        )
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        kernel = functools.partial(_nlm_hrw_kernel, **kern_kwargs)
        flops_per_off = 14
    else:
        extra_in = ()
        extra_specs = []
        kernel = functools.partial(_nlm_kernel, **kern_kwargs)
        flops_per_off = 22
    wc, nw = pl.pallas_call(
        kernel,
        grid=(gh, gw, n_frames),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((4, th, tw), lambda i, j, f: (0, i, j)),
            pl.BlockSpec((1, th, tw), lambda i, j, f: (0, i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, h, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, th + 2 * rht, tw + 2 * lht), jnp.float32),
            pltpu.VMEM((4, th + 2 * rhn, tw + 2 * lhn), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_offsets * flops_per_off * h * w * n_frames,
            bytes_accessed=4 * h * w * 4 * (2 + n_frames),
            transcendentals=n_offsets * h * w * n_frames,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(padded_t, padded_n, valid.astype(jnp.float32), *extra_in)
    return wc, nw


@functools.partial(jax.jit, static_argnums=(2, 3))
def nlm_accumulate(
    target: jnp.ndarray,
    neighbour: jnp.ndarray,
    params: NlmParams = NlmParams(),
    tiling: Optional[TilingConfig] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One frame's NLM accumulation (shaders/nonlocal.comp:30-65).

    Returns (weightColor (H,W,4), normWeight (H,W)); normWeight is seeded with
    params.norm_seed for this frame (nonlocal.comp:32). Sum partials across
    frames and finish with normalize() for temporal multiframe NLM (or use
    nlm_accumulate_frames, which keeps the accumulators on-chip).
    """
    wc, nw = _nlm_planar_frames(
        _to_planar(target), _to_planar(neighbour)[None], params, tiling
    )
    return _from_planar(wc), nw[0]


@functools.partial(jax.jit, static_argnums=(2, 3))
def nlm_accumulate_frames(
    target: jnp.ndarray,
    frames: jnp.ndarray,
    params: NlmParams = NlmParams(),
    tiling: Optional[TilingConfig] = None,
    valid: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal NLM accumulation over a stacked (F, H, W, 4) frame batch in ONE
    kernel launch: the frame axis is the innermost grid dimension, so the
    weight accumulators live in VMEM across frames like the reference's
    persistent weights buffer (src/main.cpp:1430-1433) instead of paying a
    per-frame HBM round-trip. Each frame contributes its norm seed
    (shaders/nonlocal.comp:32); finish with normalize(). `valid` ((F,) float
    0/1) masks padding frames: a masked frame contributes neither weights
    nor its seed."""
    wc, nw = _nlm_planar_frames(
        _to_planar(target),
        jnp.transpose(frames.astype(jnp.float32), (0, 3, 1, 2)),
        params,
        tiling,
        valid,
    )
    return _from_planar(wc), nw[0]


# ---------------------------------------------------------------------------
# Normalize (shaders/normalize.comp)
# ---------------------------------------------------------------------------


def _normalize_kernel(wc_ref, nw_ref, out_ref, *, sentinel):
    nw = nw_ref[0]
    zero = nw == 0.0
    safe = jnp.where(zero, 1.0, nw)
    for c in range(4):
        out_ref[c] = jnp.where(zero, jnp.float32(sentinel[c]), wc_ref[c] / safe)


@functools.partial(jax.jit, static_argnums=(2, 3))
def normalize(
    weight_color: jnp.ndarray,
    norm: jnp.ndarray,
    params: NormalizeParams = NormalizeParams(),
    tiling: Optional[TilingConfig] = None,
) -> jnp.ndarray:
    """Normalization pass (shaders/normalize.comp:30-44): out = wc / nw with a
    magenta sentinel where nw == 0. weight_color: (H,W,4); norm: (H,W)."""
    wc = _to_planar(weight_color)
    h, w = norm.shape
    th, tw = _pick_tile(h, w, tiling)
    grid = (pl.cdiv(h, th), pl.cdiv(w, tw))
    kernel = functools.partial(
        _normalize_kernel,
        sentinel=(params.sentinel_r, params.sentinel_g, params.sentinel_b, params.sentinel_a),
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, th, tw), lambda i, j: (0, i, j)),
            pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j)),
        ],
        out_specs=pl.BlockSpec((4, th, tw), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((4, h, w), jnp.float32),
        interpret=_use_interpret(),
    )(wc, norm[None].astype(jnp.float32))
    return _from_planar(out)
