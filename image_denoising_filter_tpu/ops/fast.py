"""Approximate "turbo" bilateral: per-channel bilateral grid.

This is an OPT-IN speed mode, deliberately separate from the exact parity
kernels in ops/stencils.py (the exact joint-RGB bilateral has no cheap
algebraic shortcut -- see docs/PERFORMANCE.md). Approximations, all measured
in tests:

  * per-channel range kernel exp(-dc^2 / 2 sigma_c^2) guided by each channel
    itself, instead of the exact joint-RGB kernel (alpha rides green);
  * the classic bilateral-grid evaluation (Chen/Paris/Durand): K intensity
    levels x (H/d, W/d) spatial cells. Level weights are computed from the
    d-downsampled image, blurred with the *exact separable spatial Gaussian*
    (scaled to the low-res grid), normalized, upsampled bilinearly, and
    combined per pixel with a tent (piecewise-linear) interpolation across
    levels -- dense ops only, no scatter/gather, so XLA keeps the whole thing
    on fused vector loops.

Quality on noisy natural-image content: ~44-50 dB vs the exact kernel and
denoising PSNR on par with it (the per-channel kernel discriminates chroma
noise exactly as well); see tests/test_fast.py. Content-dependence caveat: on
full-range iid noise (no structure) a grid method necessarily diverges from
the exact filter, which barely smooths such input -- turbo targets real
renders/photos, not white noise.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BilateralParams, BorderPolicy
from .stencils import LOG2E as _LOG2E
from .stencils import _round_up, _use_interpret


def _gauss_taps(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return (w / w.sum()).astype(np.float32)


def _grid_taps(sigma_spatial: float, d: int) -> np.ndarray:
    """Grid-resolution blur taps with the pooling prefilter compensated.

    The d x d mean-pool is itself a spatial prefilter: the mean of d DISCRETE
    unit-spaced samples has variance (d^2 - 1)/12 (not the continuous box's
    d^2/12 -- at d=1 the pool is the identity and must contribute zero); the
    grid blur only needs to supply the remainder so the *total* spatial
    kernel matches the exact filter's sigma_spatial. The round-2 taps used
    sigma_spatial/d uncompensated, double-blurring at d >= 4 (measured: the
    compensated taps are both closer to the exact kernel and cheaper --
    fewer taps)."""
    var = sigma_spatial * sigma_spatial - (d * d - 1) / 12.0
    sigma_g = math.sqrt(max(var, 0.04)) / d
    radius = max(1, int(math.ceil(4.0 * sigma_g)))
    return _gauss_taps(sigma_g, radius)


def _sep_blur(x: jnp.ndarray, taps: np.ndarray, border: str) -> jnp.ndarray:
    """Separable Gaussian blur over the last two axes of (..., H, W)."""
    r = (len(taps) - 1) // 2
    mode = "edge" if border == BorderPolicy.CLAMP else "constant"

    def blur_last(v):
        pad = [(0, 0)] * (v.ndim - 1) + [(r, r)]
        vp = jnp.pad(v, pad, mode=mode)
        out = taps[0] * jax.lax.slice_in_dim(vp, 0, v.shape[-1], axis=-1)
        for i in range(1, len(taps)):
            out = out + taps[i] * jax.lax.slice_in_dim(
                vp, i, i + v.shape[-1], axis=-1
            )
        return out

    x = blur_last(x)  # along W
    x = jnp.swapaxes(blur_last(jnp.swapaxes(x, -1, -2)), -1, -2)  # along H
    return x


def _pool_pallas(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """d x d mean-pool of (4, H, W) -> (4, H/d, W/d) in ONE Pallas pass.

    The XLA strided-slice pool (_downsample) runs its lane-decimation pass at
    ~half HBM speed and round-trips a row-pooled intermediate (~0.52 ms at
    4K/d=4); here both pooling axes are banded bf16 MXU matmuls on a VMEM
    tile -- one HBM read of the image, one small write (~0.19 ms). The 1/d
    band weights are exact in bf16 for d in {2, 4, 8}; the bf16 operand
    rounding (~1e-3 relative) is far inside the turbo approximation budget
    (the grid itself is stored bf16). H and W must be multiples of d
    (callers pre-pad); ragged *tile* blocks are fine -- pooling is
    block-local, so boundary garbage only reaches masked-out cells."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, h, w = x.shape
    hs, ws = h // d, w // d
    # Output tile at grid res; input tile (4, tph*d, tpw*d) f32 <= ~8 MB.
    tph = max(8, min(256 // d, _round_up(hs, 8)))
    tpw = max(128, min(2048 // d, _round_up(ws, 128)))
    nh, nw = -(-hs // tph), -(-ws // tpw)

    v_np = np.zeros((tph, tph * d), np.float32)
    for r_ in range(tph):
        v_np[r_, r_ * d : (r_ + 1) * d] = 1.0 / d
    u_np = np.zeros((tpw * d, tpw), np.float32)
    for c_ in range(tpw):
        u_np[c_ * d : (c_ + 1) * d, c_] = 1.0 / d
    v_mat = jnp.asarray(v_np, jnp.bfloat16)
    u_mat = jnp.asarray(u_np, jnp.bfloat16)

    # Ragged tile blocks put undefined values on the matmul CONTRACTION axes
    # (a NaN there poisons the whole product row even under zero band
    # weights) -- zero them with an iota mask on the boundary blocks.
    ragged = (hs % tph != 0) or (ws % tpw != 0)

    def kern(x_ref, v_ref, u_ref, out_ref):
        vm = v_ref[:]
        um = u_ref[:]
        if ragged:
            i, j = pl.program_id(0), pl.program_id(1)
            shp = (tph * d, tpw * d)
            riota = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
            ciota = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
            valid = (riota < h - i * (tph * d)) & (ciota < w - j * (tpw * d))
        for c in range(4):
            xb = x_ref[c].astype(jnp.bfloat16)
            if ragged:
                xb = jnp.where(valid, xb, jnp.bfloat16(0.0))
            rows = jnp.dot(vm, xb, preferred_element_type=jnp.float32)
            out_ref[c] = jnp.dot(
                rows.astype(jnp.bfloat16), um, preferred_element_type=jnp.float32
            )

    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((4, tph * d, tpw * d), lambda i, j: (0, i, j)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tph, tpw), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((4, hs, ws), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(x, v_mat, u_mat)


def _downsample(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Mean-pool the last two axes by d (shapes pre-padded to multiples).

    Strided-slice sums, rows then lanes: the reshape((..., h/d, d, w/d, d))
    .mean() formulation costs ~24 ms at 4K/d=2 on v5e (the lane-axis split
    forces a full relayout — it was 75%% of the whole turbo pipeline);
    row-strided then lane-strided partial sums measure at HBM speed
    (~0.3 ms), and d^2 full-res strided slices are 7x worse than even the
    reshape (tools/pool_bench.py)."""
    acc = None
    for i in range(d):
        s = x[..., i::d, :]
        acc = s if acc is None else acc + s
    acc2 = None
    for j in range(d):
        s = acc[..., :, j::d]
        acc2 = s if acc2 is None else acc2 + s
    return acc2 * (1.0 / (d * d))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def bilateral_fast(
    img: jnp.ndarray,
    params: BilateralParams = BilateralParams(),
    levels: int = 6,
    downsample: int = 2,
) -> jnp.ndarray:
    """Approximate bilateral filter (per-channel bilateral grid).

    img: (H, W, 4) float32. levels = K intensity levels (6 measured equal
    in quality to 8 at every d on both gate contents, 25%% faster);
    downsample = spatial grid reduction d (1 disables; 2 is safe for
    sigma_spatial >= 2, 4 trades a little edge sharpness for more speed).
    """
    planar = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))
    out = bilateral_fast_planar(planar, params, levels, downsample)
    return jnp.transpose(out, (1, 2, 0))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def bilateral_fast_planar(
    planar: jnp.ndarray,
    params: BilateralParams = BilateralParams(),
    levels: int = 6,
    downsample: int = 2,
) -> jnp.ndarray:
    """Planar-layout core of `bilateral_fast`: (4, H, W) in, (4, H, W) out.

    The channel-minor (H, W, 4) public layout costs two full-resolution
    relayout passes at 4K; pipelines that already hold planar frames (the
    Session does) should call this directly."""
    planar = planar.astype(jnp.float32)
    _, h, w = planar.shape
    inv2sc = 0.5 / (params.sigma_color**2)

    rgb = planar[:3]

    d = max(1, downsample)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and d > 1:
        # Fused Pallas pipeline: grid construction (range weights + blur +
        # normalize per level, one HBM read/write) then grid slicing (tent
        # interp fused with MXU-matmul bilinear upsampling).
        return _grid_pipeline_planar(planar, params, levels, d)

    hp = -(-h // d) * d
    wp = -(-w // d) * d
    mode = "edge" if params.border == BorderPolicy.CLAMP else "constant"
    planar_p = jnp.pad(planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)

    # Build the grid at LOW resolution: guide + payload from the pooled image.
    small = _downsample(planar_p, d) if d > 1 else planar_p  # (4, hs, ws)
    taps = _grid_taps(params.sigma_spatial, d)
    rgb_s = small[:3]
    # Grid range from the POOLED image (one cheap reduce instead of a full-res
    # HBM pass); full-res guide values outside the pooled range clamp to the
    # edge level in the tent interpolation below.
    lmin = jnp.min(rgb_s, axis=(1, 2))  # (3,)
    lmax = jnp.max(rgb_s, axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)  # (3,)
    level_vals = lmin[:, None] + step[:, None] * jnp.arange(
        levels, dtype=jnp.float32
    )  # (3, K)
    diff = rgb_s[:, None] - level_vals[:, :, None, None]
    wk = jnp.exp(-(diff * diff) * inv2sc)  # (3, K, hs, ws)

    num_rgb = wk * rgb_s[:, None]  # (3, K, hs, ws)
    num_a = wk[1] * small[3][None]  # (K, hs, ws)

    num_rgb = _sep_blur(num_rgb, taps, params.border)
    num_a = _sep_blur(num_a, taps, params.border)
    den = _sep_blur(wk, taps, params.border)
    safe = jnp.maximum(den, 1e-20)
    out_rgb_k = num_rgb / safe  # (3, K, hs, ws)
    out_a_k = num_a / safe[1]  # (K, hs, ws)

    # Clip to the grid range: full-res extremes that pooling averaged away
    # slice the edge level (the pooled-range semantics).
    t = jnp.clip(
        (rgb - lmin[:, None, None]) / step[:, None, None], 0.0, levels - 1.0
    )  # (3, H, W)
    out_rgb = jnp.zeros((3, h, w), jnp.float32)
    out_a = jnp.zeros((h, w), jnp.float32)
    t_g = t[1]
    for k in range(levels):
        tent = jnp.clip(1.0 - jnp.abs(t - k), 0.0, 1.0)  # (3, H, W)
        if d > 1:
            up = jax.image.resize(
                out_rgb_k[:, k], (3, hp, wp), method="bilinear"
            )[:, :h, :w]
            up_a = jax.image.resize(out_a_k[k], (hp, wp), method="bilinear")[:h, :w]
        else:
            up = out_rgb_k[:, k][..., :h, :w]
            up_a = out_a_k[k][..., :h, :w]
        out_rgb = out_rgb + tent * up
        out_a = out_a + jnp.clip(1.0 - jnp.abs(t_g - k), 0.0, 1.0) * up_a

    return jnp.concatenate([out_rgb, out_a[None]], axis=0)


def _default_build_tile(d: int) -> tuple[int, int]:
    """Build-kernel tile from the round-3 chip sweep (tools/tile_sweep_r3.py).

    Narrower tiles cut the cols-blur band's mostly-zero MXU FLOPs
    (~2.3 kFLOP/cell at tw=1024 vs ~0.8 k at tw=256): d=2 1716->1925 and
    d=4 5388->6074 Mpix/s at 4K. d=8's grid is tiny (270x480) and keeps the
    wide single-slab tile (9156 Mpix/s; every narrower option lost 4-11%)."""
    if d >= 8:
        return (128, 1024)
    if d >= 4:
        return (64, 256)
    return (128, 256)


def _default_slice_tile(d: int) -> tuple[int, int]:
    """Slice-kernel tile (th, tw) from the round-3 chip sweeps: 256 rows beat
    128 by ~15%, and 384 beats 256 by another ~7% at d=4 with the narrow
    build tile (6,578 vs ~6,150 Mpix/s two-rep A/B; ties on the guided
    kernel, collapses at 512 -- VMEM pressure); d=2 ties at 384 and keeps
    256. d=2 prefers tw=512 over 1024 (+3.4%: upsample band FLOPs scale
    with tile width); wider d keeps 1024 (the gws = tw/d >= 128 DMA floor
    forbids narrower there anyway)."""
    return (384 if d >= 4 else 256, 512 if d <= 2 else 1024)


def _default_fused(d: int) -> bool:
    """Whether the fully-fused build+slice kernel is the default pipeline at
    this downsample (chip A/B, tools/fused_ab_r4.py). OFF everywhere until
    the round-4 chip measurements land; the two-kernel pipeline remains the
    sharded path's building block either way."""
    return False


def _default_guided_fused(d: int) -> bool:
    """Whether the guided-layers pipeline defaults to the fused build+slice
    kernel at this downsample. Round-4 chip A/B (tools/fused_guided_ab_r4.py,
    docs/PERFORMANCE.md): unlike the bilateral family (where fusion LOSES
    22-25% -- its bf16 grid is small enough that the HBM round-trip beats
    re-blurring the build halo per slice tile), the guided grid is nc*K = 42
    bf16 planes (~174 MB at 4K/d=2) and the round-trip dominates: fused wins
    d=2 1,509 vs 1,076 Mpix/s render (+40%, +35% noise) and d=4 2,768 vs
    2,333 (+19%, +9% noise). d=8 is unmeasured for the guided family and the
    bilateral trend says fusion's halo overhead grows with d, so it stays on
    the two-kernel path. The sharded path uses the two-kernel building
    blocks directly either way."""
    return d in (2, 4)


def _default_pad_free(d: int) -> bool:
    """Whether the two-kernel pipeline defaults to the PAD-FREE grid layout:
    the build kernel emits the grid directly in the slice kernel's padded
    slab layout (_build_grid_pallas extend_to), removing the full-grid
    jnp.pad copy between them (~150 MB of HBM traffic at 4K/d=2 -- the
    single biggest remaining glue item of round-4 VERDICT #4). Outputs
    match to the stored-grid bf16-ulp contract (tests/test_fast.py).

    Round-5 chip A/B (tools/padfree_ab_r5.py, interleaved 3 rounds,
    sign-consistent): d=2 WINS +4.1%% render / +4.9%% noise (2,573/2,501 vs
    2,472/2,384 Mpix/s medians) -- the 74 MB grid's pad copy dominates the
    overhang cost. d=4 LOSES 19%% (the slab alignment overhang is +20%% grid
    cols => +25%% build blocks on a grid whose pad copy was only ~37 MB);
    d=8 is a wash-to--4%%. Default ON at d=2 only.

    Round-5 follow-up (tools/padfree_skip_ab_r5.py): zero-filling the
    all-overhang build blocks (skipping their DMA + blur math entirely)
    recovered only ~2%% -- d=4 still loses 17.3%%/16.4%% sign-consistent
    and d=8 -5.5%%/wash, so the d>=4 cost is STRUCTURAL to the slab-extent
    emission (ragged 1088-col output blocks / lost write coalescing), not
    the overhang compute. Negative result: legacy stays at d>=4. d=2
    re-measured with the branch in the kernel: padfree +9.4%% render /
    +21.8%% noise vs legacy (sign-consistent; no regression)."""
    return d == 2


def _default_cull_mask(d: int) -> bool:
    """Boundary-garbage handling in the slice kernels' culling reduction
    (exact either way; see _slice_grid_pallas). Round-4 chip A/B
    (tools/cullmask_ab_r3.py + interleaved rechecks, docs/PERFORMANCE.md):
    the unmasked reduce (scalar NaN guards, garbage only widens bounds) wins
    both content classes at d=2 (+8.6%/+5.4%) and d=8 (+8.7%/+3.7%); at d=4
    it is a wash (render +2-3%, noise -2-4% interleaved), so d=4 keeps the
    masked reduce of the round-3 bench of record."""
    return d != 4


def _grid_pipeline_planar(
    planar: jnp.ndarray,  # (4, H, W) float32
    params: BilateralParams,
    levels: int,
    d: int,
    tile_h: int | None = None,
    tile_w: int | None = None,
    build_tile: tuple[int, int] | None = None,
    cull_mask: bool | None = None,  # None -> _default_cull_mask(d)
    out_dtype=jnp.float32,
    fused: bool | None = None,
    pad_free: bool | None = None,  # None -> _default_pad_free(d)
) -> jnp.ndarray:
    """The Pallas grid pipeline: pool -> build grid -> slice, either as two
    kernels (grid through HBM) or as the fully-fused single kernel
    (_fused_grid_pipeline_planar, `fused=True`) -- value-identical.

    Factored out of `bilateral_fast_planar` so the sharded path
    (parallel.spatial.spatial_bilateral_fast) can reuse the exact same build +
    slice kernels per shard, and so tests can exercise the Pallas path in
    interpret mode on the CPU backend."""
    _, h, w = planar.shape
    dth, dtw = _default_slice_tile(d)
    if tile_h is None:
        tile_h = dth
    if tile_w is None:
        tile_w = dtw  # 2048-wide tiles hit the compile-service size limit
    # Clamp the slice tile to the image: small inputs (tests, shards) must
    # not pad up to the 4K-optimal tile. Floors keep the slab DMA provably
    # aligned: gws = tile_w/d must be a 128-multiple and ghs = tile_h/d a
    # 16-multiple (bf16 sublane tiling), or Mosaic rejects the tile index.
    tile_h = max(16 * d, min(tile_h, _round_up(h, 16 * d)))
    tile_w = max(128 * d, min(tile_w, _round_up(w, 128 * d)))
    if cull_mask is None:
        cull_mask = _default_cull_mask(d)
    if fused is None:
        fused = _default_fused(d)
    if fused:
        return _fused_grid_pipeline_planar(
            planar, params, levels, d, tile_h, tile_w,
            cull_mask=cull_mask, out_dtype=out_dtype,
        )
    inv2sc = 0.5 / (params.sigma_color**2)
    ua = params.uniform_alpha
    mode = "edge" if params.border == BorderPolicy.CLAMP else "constant"
    hp = -(-h // d) * d
    wp = -(-w // d) * d
    planar_p = jnp.pad(planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)
    small = _pool_pallas(planar_p, d)
    # Grid range from the pooled image: saves a full-res HBM reduce pass; the
    # slice kernel clips t to [0, K-1] so out-of-range extremes hit the edge
    # level. The sharded path computes the same range via pmin/pmax of the
    # shard-local pooled mins (exact row partition => identical values).
    lmin = jnp.min(small[:3], axis=(1, 2))
    lmax = jnp.max(small[:3], axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)
    taps = _grid_taps(params.sigma_spatial, d)
    bth, btw = build_tile if build_tile is not None else _default_build_tile(d)
    if pad_free is None:
        pad_free = _default_pad_free(d)
    extend_to = None
    if pad_free:
        # Slice slab geometry (mirrors _slice_grid_pallas): the extended
        # build emits the grid at exactly the padded slab extent so the
        # slice's grid pad copy vanishes.
        hs, ws = hp // d, wp // d
        ghs, gws = tile_h // d, tile_w // d
        slab_h = _round_up(ghs + 2, 16)  # bf16 grid: (16, 128) tiles
        slab_w = _round_up(gws + 2, 128)
        nh_s, nw_s = -(-h // tile_h), -(-w // tile_w)
        th_tot = max((nh_s - 1) * ghs + slab_h, hs + 2)
        tw_tot = max((nw_s - 1) * gws + slab_w, ws + 2)
        # The extended build can only replicate cell hs-1 into cell hs's
        # slot when both live in the same output block (same for columns):
        # fall back to the legacy pad path on the rare offending shapes.
        bth_eff = min(bth, _round_up(th_tot, 16))
        btw_eff = min(btw, _round_up(tw_tot, 128))
        if hs % bth_eff != bth_eff - 1 and ws % btw_eff != btw_eff - 1:
            extend_to = (th_tot, tw_tot)
    grid_k = _build_grid_pallas(
        small,
        lmin,
        step,
        levels,
        taps,
        params.border,
        inv2sc,
        tile_h=bth,
        tile_w=btw,
        uniform_alpha=ua,
        extend_to=extend_to,
    )
    # Uniform alpha: sum(tent_k) == 1 and the grid's alpha payload is the
    # constant itself, so the output alpha plane is just that constant --
    # the kernel skips the whole alpha level sweep (shaders/bialteral.comp:70
    # carries alpha through the same normalized sum).
    alpha_val = planar[3, 0, 0] if ua else None
    # The slice kernel takes the UNPADDED guide and writes the unpadded
    # output (ragged boundary blocks are masked): no full-res pad/crop
    # copies. pad_edge folds the grid's (1, 1) edge pad into the slab
    # alignment pad -- one grid copy instead of two; with the extended
    # (pad-free) build the grid is already IN slab layout and the slice
    # pads nothing at all.
    return _slice_grid_pallas(
        planar[:3],
        grid_k,
        lmin,
        1.0 / step,
        levels,
        d,
        tile_h,
        tile_w,
        uniform_alpha=ua,
        alpha_val=alpha_val,
        pad_edge=extend_to is None,
        cull_mask=cull_mask,
        out_dtype=out_dtype,
    )


# ---------------------------------------------------------------------------
# Fused grid-slicing epilogue (TPU): the K-level tent interpolation fused with
# the bilinear upsample in one Pallas kernel. Upsampling is expressed as two
# banded-matrix multiplies per plane (MXU work); the tent weights come from the
# full-resolution guide tile. This removes the K full-resolution XLA passes
# that dominate the pure-XLA path (~10x on the slicing stage).
# ---------------------------------------------------------------------------


def _upsample_matrix(d: int, n_in: int, n_out: int) -> np.ndarray:
    """Bilinear weights from grid cells [g0-1 .. ] to n_out full-res samples
    (half-pixel centers: output x samples grid at (x+0.5)/d - 0.5; the slab
    starts one grid cell early so edge taps read the pre-padded grid)."""
    u = np.zeros((n_in, n_out), np.float32)
    for x in range(n_out):
        g = (x + 0.5) / d - 0.5
        f = math.floor(g)
        w1 = g - f
        u[f + 1, x] += 1.0 - w1
        u[f + 2, x] += w1
    return u


def _slice_grid_pallas(
    guide: jnp.ndarray,  # (3, H, W) full-res rgb (padded to tile multiples)
    grid: jnp.ndarray,  # (nc*K, hs+2, ws+2) edge-padded grid, level-major
    lmin: jnp.ndarray,  # (3,)
    inv_step: jnp.ndarray,  # (3,)
    levels: int,
    d: int,
    tile_h: int = 256,
    tile_w: int = 1024,  # round-3 sweep: 256x1024 at 4K
    uniform_alpha: bool = False,
    alpha_val: jnp.ndarray | None = None,  # scalar; required if uniform_alpha
    pad_edge: bool = False,  # True: grid is RAW (hs, ws); fold the (1, 1)
    # edge pad into the alignment pad (one grid copy instead of two -- at
    # d=2 the grid is ~74 MB, a whole extra HBM pass). Sharded callers pass
    # False with their halo-assembled (hs+2, ws+2) grids.
    cull_mask: bool = True,  # True: mask boundary-block garbage out of the
    # culling min/max with a full-res iota/where (the round-3
    # bench-of-record path, ~7 VPU ops/px on every block when the image is
    # not tile-multiple). False: reduce over the raw (clipped) guide and
    # defuse NaN with scalar guards -- garbage can only WIDEN the bounds
    # (exact either way; boundary blocks may cull less). Chip A/B pending
    # (tools/cullmask_ab_r3.py).
    out_dtype=jnp.float32,  # bf16 halves the output HBM write (the output
    # feeds the LDR 255x quantize or an approximate-mode consumer; bf16's
    # ~4e-3 relative rounding sits ~65 dB down, inside the turbo budget).
    # Accumulation stays f32; opt-in, chip A/B pending.
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, h, w = guide.shape
    nc = 3 if uniform_alpha else 4  # grid planes per level
    ghs, gws = tile_h // d, tile_w // d
    # bf16 grids tile as (16, 128): round the slab DMA to bf16 alignment.
    row_tile = 16 if grid.dtype == jnp.bfloat16 else 8
    slab_h = -(-(ghs + 2) // row_tile) * row_tile
    slab_w = -(-(gws + 2) // 128) * 128
    # Ragged grid: guide/out stay UNPADDED (cdiv grid, Pallas masks boundary
    # blocks). The round-2 kernel required tile-multiple padding, which cost
    # a full-res jnp.pad copy of the guide plus a full-res crop of the output
    # (~0.6 ms of pure HBM copies at 4K). Boundary-block garbage can only
    # reach discarded pixels -- or the culling min/max, handled per
    # `cull_mask` in the kernel.
    nh, nw = -(-h // tile_h), -(-w // tile_w)
    ragged = (h % tile_h != 0) or (w % tile_w != 0)
    # Bilinear weights are multiples of 1/d -- exact in bf16; keeping the
    # matrices in the grid's dtype keeps the dot a single-pass bf16 matmul.
    u_mat = jnp.asarray(_upsample_matrix(d, gws + 2, tile_w)).astype(grid.dtype)
    v_mat = jnp.asarray(_upsample_matrix(d, ghs + 2, tile_h).T).astype(grid.dtype)

    # The padded grid must cover every tile's slab DMA AND keep >= 1 edge
    # row/col on each side of the raw grid (lead/trail edge replicas).
    lead = 1 if pad_edge else 0
    th_tot = max((nh - 1) * ghs + slab_h, grid.shape[1] + 2 * lead)
    tw_tot = max((nw - 1) * gws + slab_w, grid.shape[2] + 2 * lead)
    if lead == 0 and th_tot == grid.shape[1] and tw_tot == grid.shape[2]:
        # Grid already in slab layout (the extended build kernel emits it
        # directly, _build_grid_pallas extend_to): no pad copy at all.
        grid_p = grid
    else:
        grid_p = jnp.pad(
            grid,
            (
                (0, 0),
                (lead, th_tot - grid.shape[1] - lead),
                (lead, tw_tot - grid.shape[2] - lead),
            ),
            mode="edge",
        )
    # lim rows 0-2: (lmin, 1/step) per channel; row 3: (alpha_const, 0).
    av = alpha_val if uniform_alpha else jnp.float32(0.0)
    lim = jnp.concatenate(
        [
            jnp.stack([lmin, inv_step], axis=1),
            jnp.stack([av.astype(jnp.float32), jnp.float32(0.0)])[None],
        ],
        axis=0,
    )  # (4, 2)

    def kern(guide_ref, grid_hbm, lim_ref, u_ref, v_ref, out_ref, slab, acc, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            grid_hbm.at[:, pl.ds(i * ghs, slab_h), pl.ds(j * gws, slab_w)],
            slab,
            sem,
        )
        cp.start()
        ts = []
        for c in range(3):
            # Clip to the grid range: lmin/step come from the pooled image,
            # so full-res extremes can fall outside -- they slice the edge
            # level (tent sums to 1 on the clipped value).
            t = (guide_ref[c] - lim_ref[c, 0]) * lim_ref[c, 1]
            ts.append(jnp.clip(t, 0.0, float(levels - 1)))
        # Per-tile level culling bounds: tent_k is nonzero somewhere in the
        # tile iff tmin[c] < k+1 and tmax[c] > k-1. EXACT: culled levels have
        # identically zero tent weight on every pixel of the tile. Real
        # content is locally low-dynamic-range, so most tiles sweep a small
        # subset of the K levels.
        #
        # Two reduction variants (exact either way; `cull_mask` kwarg):
        #  * masked: boundary-block garbage replaced by the mid level with a
        #    full-res iota/where before the reduce (tight bounds everywhere;
        #    ~7 VPU ops/px on every block when the image is not
        #    tile-multiple, which 4K never is);
        #  * unmasked: reduce the raw (clipped) guide; garbage can only
        #    WIDEN the bounds (boundary blocks may cull less), and the one
        #    real hazard -- NaN poisoning the min/max so every pl.when goes
        #    false and levels get SKIPPED -- is defused by scalar guards.
        if cull_mask and ragged:
            riota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
            ciota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
            valid = (riota < h - i * tile_h) & (ciota < w - j * tile_w)
            mid = jnp.float32((levels - 1) * 0.5)
            red = [jnp.where(valid, t, mid) for t in ts]
            tmins = [jnp.min(t) for t in red]
            tmaxs = [jnp.max(t) for t in red]
        else:
            tmins = []
            tmaxs = []
            for t in ts:
                m, M = jnp.min(t), jnp.max(t)
                tmins.append(jnp.where(m == m, m, jnp.float32(0.0)))
                tmaxs.append(jnp.where(M == M, M, jnp.float32(levels - 1)))
        cp.wait()
        um = u_ref[:]
        vm = v_ref[:]

        def upsample(plane):
            # Single-pass bf16 matmuls: the banded weights are exact in bf16
            # and the ~1e-3 rounding on grid values is far inside the turbo
            # approximation budget.
            cell = slab[plane, 0 : ghs + 2, 0 : gws + 2]
            return jnp.dot(
                vm,
                jnp.dot(cell, um, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        def up_delta(k, c):
            # Level delta at GRID resolution (upsampling is linear, so
            # up(g_{k+1}) - up(g_k) == up(g_{k+1} - g_k) -- one matmul).
            dcell = (
                slab[(k + 1) * nc + c, 0 : ghs + 2, 0 : gws + 2]
                - slab[k * nc + c, 0 : ghs + 2, 0 : gws + 2]
            )
            return jnp.dot(
                vm,
                jnp.dot(dcell, um, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        # Telescoped tent interpolation: sum_k tent_k(t) g_k == g_0 +
        # sum_{k<K-1} clamp(t-k, 0, 1) (g_{k+1} - g_k) for t in [0, K-1]
        # (exactly -- the tent sum is piecewise linear and both sides agree
        # on every segment). One ramp is 3 VPU ops vs the tent's 5, and the
        # per-tile culling gets sharper: a level ramp is identically 0 when
        # tmax <= k (skip entirely) and identically 1 when tmin >= k+1 (add
        # the delta unramped).
        for c in range(3):
            acc[c] = upsample(c)  # base plane g_0
            if not uniform_alpha and c == 1:
                acc[3] = upsample(3)
        for k in range(levels - 1):
            for c in range(3):
                # Three exact cases per (level, channel), from the tile's
                # guide range: ramp identically 0 (tmax <= k, skip), ramp
                # identically 1 (tmin >= k+1, add the delta unramped -- no
                # clip/multiply VPU work), else the ramped general case.
                @pl.when((tmaxs[c] > k) & (tmins[c] < k + 1))
                def _ramp(k=k, c=c):
                    ramp = jnp.clip(ts[c] - k, 0.0, 1.0)
                    acc[c] += ramp * up_delta(k, c)
                    if not uniform_alpha and c == 1:
                        # alpha rides green: same ramp, same culling window.
                        acc[3] += ramp * up_delta(k, 3)

                @pl.when(tmins[c] >= k + 1)  # implies tmax > k
                def _interior(k=k, c=c):
                    acc[c] += up_delta(k, c)
                    if not uniform_alpha and c == 1:
                        acc[3] += up_delta(k, 3)

        for c in range(3):
            out_ref[c] = acc[c].astype(out_ref.dtype)
        if uniform_alpha:
            out_ref[3] = (
                jnp.zeros((tile_h, tile_w), jnp.float32) + lim_ref[3, 0]
            ).astype(out_ref.dtype)
        else:
            out_ref[3] = acc[3].astype(out_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((4, h, w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((nc * levels, slab_h, slab_w), grid.dtype),
            pltpu.VMEM((3 if uniform_alpha else 4, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(guide, grid_p, lim, u_mat, v_mat)


# ---------------------------------------------------------------------------
# Fully-fused build+slice kernel (TPU): one pallas_call that, per SLICE tile,
# DMAs the pooled halo window, constructs the needed grid levels entirely in
# VMEM (same banded-matmul blur + bf16 storage as _build_grid_pallas, so the
# values are bit-identical), and tent-slices them against the full-res guide.
# vs the two-kernel pipeline this removes the whole grid HBM round-trip
# (~74 MB write + slab re-read at 4K/d=2), one kernel launch + its XLA glue,
# AND lets the per-tile level culling skip grid CONSTRUCTION, not just
# slicing (the standalone build kernel must always compute all K levels).
# Cost: the blur halo is recomputed per slice tile -- the same overhead ratio
# the standalone build kernel pays per build tile at its swept tile sizes.
# ---------------------------------------------------------------------------


def _fused_grid_pipeline_planar(
    planar: jnp.ndarray,  # (4, H, W) float32
    params: BilateralParams,
    levels: int,
    d: int,
    tile_h: int,
    tile_w: int,
    cull_mask: bool = True,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """pool -> (range reduce) -> ONE fused build+slice Pallas kernel.

    Same math as the two-kernel pipeline everywhere: the same pooled input
    padding, banded blur matmuls, bf16 grid rounding, upsample matrices, and
    the grid's (1, 1) edge replication reproduced in-kernel with boundary
    row/col fixups. ONE deliberate difference: the telescoped tent sum is
    based at g_{floor(tmin)} instead of g_0, so levels below the tile's guide
    range are never BUILT at all (the low-level analog of the high-level
    culling; the standalone build kernel must compute all K levels). For
    tiles whose range touches level 0 (floor(tmin) == 0, e.g. any full-range
    content) the level structure is identical to the two-kernel slice and
    outputs agree to stored-cell bf16 rounding (XLA's f32 dot regroups
    partial sums by contraction shape, and the fused blur window is 2 cells
    taller than the standalone build tile -- measured ~1e-4 of pixels flip
    one bf16 ulp; tested at the sharded-tests contract). Elsewhere the
    rebasing additionally reassociates the bf16-rounded level deltas, a
    <= ~2e-3-absolute difference (the same bf16 delta-rounding floor both
    pipelines carry vs an f32 grid, ~20 dB below the turbo modes' 40 dB
    quality gate; tested at that bound)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, h, w = planar.shape
    inv2sc = 0.5 / (params.sigma_color**2)
    ua = params.uniform_alpha
    mode = "edge" if params.border == BorderPolicy.CLAMP else "constant"
    hp = -(-h // d) * d
    wp = -(-w // d) * d
    planar_p = jnp.pad(planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)
    small = _pool_pallas(planar_p, d)
    hs, ws = hp // d, wp // d
    lmin = jnp.min(small[:3], axis=(1, 2))
    lmax = jnp.max(small[:3], axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)
    taps = _grid_taps(params.sigma_spatial, d)
    r = (len(taps) - 1) // 2

    ghs, gws = tile_h // d, tile_w // d
    wh, ww = ghs + 2, gws + 2  # grid-cell window incl. the +-1 edge cells
    nh, nw = -(-h // tile_h), -(-w // tile_w)
    ragged = (h % tile_h != 0) or (w % tile_w != 0)
    nc = 3 if ua else 4

    # Pooled input padded like _build_grid_pallas's (edge/zero per border
    # policy): rh2 rows cover the window's 1-cell lead + blur halo with the
    # DMA start kept at the aligned i*ghs; 128 lanes on each side keep the
    # column DMA 128-aligned (the in-VMEM window slice is static).
    rh2 = -(-(r + 1) // 4) * 4
    padded = jnp.pad(
        small,
        (
            (0, 0),
            (rh2, nh * ghs + rh2 - hs),
            (128, nw * gws + 128 - ws),
        ),
        mode=mode,
    )

    # Banded blur matrices at window size (identical construction to
    # _build_grid_pallas, th->wh / tw->ww).
    eh, ew = wh + 2 * r, ww + 2 * r
    v_np = np.zeros((wh, eh), np.float32)
    for a, t in enumerate(taps):
        v_np[np.arange(wh), np.arange(wh) + a] += t
    h_np = np.zeros((ew, ww), np.float32)
    for b, t in enumerate(taps):
        h_np[np.arange(ww) + b, np.arange(ww)] += t
    v_blur = jnp.asarray(v_np)
    h_blur = jnp.asarray(h_np)
    # Upsample matrices (identical to _slice_grid_pallas's).
    u_mat = jnp.asarray(_upsample_matrix(d, ww, tile_w)).astype(jnp.bfloat16)
    v_mat = jnp.asarray(_upsample_matrix(d, wh, tile_h).T).astype(jnp.bfloat16)

    # Window rows of the last real cell, for the in-kernel edge replication
    # of cells beyond the pooled image (== the two-kernel path's grid edge
    # pad): cells >= hs replicate cell hs-1, which sits at window row
    # hs - i*ghs for the LAST tile row (the only one that can overrun).
    q_last = hs - (nh - 1) * ghs  # in [1, ghs]
    p_last = ws - (nw - 1) * gws

    av = planar[3, 0, 0] if ua else jnp.float32(0.0)
    lim = jnp.concatenate(
        [
            jnp.stack([lmin, step, 1.0 / step], axis=1),
            jnp.stack(
                [av.astype(jnp.float32), jnp.float32(0.0), jnp.float32(0.0)]
            )[None],
        ],
        axis=0,
    )  # (4, 3): rows 0-2 = (lmin, step, 1/step); row 3 = (alpha_const, -, -)

    def kern(
        guide_ref, small_hbm, lim_ref, vb_ref, hb_ref, u_ref, v_ref,
        out_ref, tile, cells, acc, sem,
    ):
        i, j = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            small_hbm.at[
                :, pl.ds(i * ghs, ghs + 2 * rh2), pl.ds(j * gws, gws + 256)
            ],
            tile,
            sem,
        )
        cp.start()
        ts = []
        for c in range(3):
            t = (guide_ref[c] - lim_ref[c, 0]) * lim_ref[c, 2]
            ts.append(jnp.clip(t, 0.0, float(levels - 1)))
        # Per-tile culling bounds (identical to _slice_grid_pallas).
        if cull_mask and ragged:
            riota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
            ciota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
            valid = (riota < h - i * tile_h) & (ciota < w - j * tile_w)
            mid = jnp.float32((levels - 1) * 0.5)
            red = [jnp.where(valid, t, mid) for t in ts]
            tmins = [jnp.min(t) for t in red]
            tmaxs = [jnp.max(t) for t in red]
        else:
            tmins = []
            tmaxs = []
            for t in ts:
                m, M = jnp.min(t), jnp.max(t)
                tmins.append(jnp.where(m == m, m, jnp.float32(0.0)))
                tmaxs.append(jnp.where(M == M, M, jnp.float32(levels - 1)))
        # Base level per channel: the telescoped sum's full (ramp==1) deltas
        # collapse into starting from g_{floor(tmin)} instead of g_0, so
        # levels below floor(tmin) need not even be BUILT.
        ms = [jnp.floor(t) for t in tmins]
        cp.wait()
        vb = vb_ref[:]
        hb = hb_ref[:]
        um = u_ref[:]
        vm = v_ref[:]
        r0 = rh2 - 1 - r  # window's blur-extended origin inside the tile
        c0 = 128 - 1 - r
        ext = [tile[c, r0 : r0 + eh, c0 : c0 + ew] for c in range(4)]

        is_top = i == 0
        is_bot = i == nh - 1
        is_left = j == 0
        is_right = j == nw - 1
        wr = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0)
        wc_i = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1)

        def blur(x):
            return jnp.dot(
                jnp.dot(vb, x, preferred_element_type=jnp.float32),
                hb,
                preferred_element_type=jnp.float32,
            )

        def edge_fix(cell):
            # Reproduce the two-kernel path's grid edge replication: window
            # row 0 is cell -1 := cell 0 (first tile row only), rows past the
            # last real cell replicate it (last tile row only); same for
            # columns. Everywhere else the window holds real cells.
            cell = jnp.where(
                jnp.logical_and(wr == 0, is_top),
                jnp.roll(cell, -1, axis=0),
                cell,
            )
            cell = jnp.where(
                jnp.logical_and(wr > q_last, is_bot),
                cell[q_last : q_last + 1, :],
                cell,
            )
            cell = jnp.where(
                jnp.logical_and(wc_i == 0, is_left),
                jnp.roll(cell, -1, axis=1),
                cell,
            )
            cell = jnp.where(
                jnp.logical_and(wc_i > p_last, is_right),
                cell[:, p_last : p_last + 1],
                cell,
            )
            return cell

        def upsample(cell_bf16):
            return jnp.dot(
                vm,
                jnp.dot(cell_bf16, um, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        for k in range(levels):
            fk = jnp.float32(k)
            for c in range(3):
                # Build g_{k,c} only if this tile's guide range can touch it:
                # k >= floor(tmin) (base or later) and k-1 < tmax (a ramp
                # ending at k can still be active). EXACT: skipped levels
                # have identically zero contribution on every pixel.
                @pl.when(jnp.logical_and(fk >= ms[c], fk - 1.0 < tmaxs[c]))
                def _build(k=k, c=c):
                    lv = lim_ref[c, 0] + lim_ref[c, 1] * np.float32(k)
                    dcol = ext[c] - lv
                    wk = jnp.exp2(
                        -(dcol * dcol) * jnp.float32(inv2sc * _LOG2E)
                    )
                    den = blur(wk)
                    num = blur(wk * ext[c])
                    safe = jnp.maximum(den, 1e-20)
                    cells[k % 2, c] = edge_fix(
                        (num / safe).astype(jnp.bfloat16)
                    )
                    if not ua and c == 1:
                        na = blur(wk * ext[3])
                        cells[k % 2, 3] = edge_fix(
                            (na / safe).astype(jnp.bfloat16)
                        )

                @pl.when(ms[c] == fk)
                def _base(k=k, c=c):
                    acc[c] = upsample(cells[k % 2, c])
                    if not ua and c == 1:
                        acc[3] = upsample(cells[k % 2, 3])

                if k > 0:
                    kk = k - 1

                    @pl.when(
                        jnp.logical_and(
                            tmaxs[c] > jnp.float32(kk),
                            tmins[c] < jnp.float32(kk + 1),
                        )
                    )
                    def _ramp(k=k, c=c, kk=kk):
                        ramp = jnp.clip(ts[c] - kk, 0.0, 1.0)
                        delta = cells[k % 2, c] - cells[(k + 1) % 2, c]
                        acc[c] += ramp * upsample(delta)
                        if not ua and c == 1:
                            da = cells[k % 2, 3] - cells[(k + 1) % 2, 3]
                            acc[3] += ramp * upsample(da)

        for c in range(3):
            out_ref[c] = acc[c].astype(out_ref.dtype)
        if ua:
            out_ref[3] = (
                jnp.zeros((tile_h, tile_w), jnp.float32) + lim_ref[3, 0]
            ).astype(out_ref.dtype)
        else:
            out_ref[3] = acc[3].astype(out_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((4, h, w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((4, ghs + 2 * rh2, gws + 256), jnp.float32),
            pltpu.VMEM((2, nc, wh, ww), jnp.bfloat16),
            pltpu.VMEM((nc, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(planar[:3], padded, lim, v_blur, h_blur, u_mat, v_mat)


# ---------------------------------------------------------------------------
# Fused grid-construction kernel (TPU): per intensity level, the range weights,
# payload products, exact separable spatial blur, and normalization all happen
# in VMEM on one halo tile -- one HBM read of the pooled image and one write of
# the grid, instead of XLA materializing every blur tap across 32 planes.
# ---------------------------------------------------------------------------


def _build_grid_pallas(
    small: jnp.ndarray,  # (4, hs, ws) pooled image
    lmin: jnp.ndarray,  # (3,)
    step: jnp.ndarray,  # (3,)
    levels: int,
    taps: np.ndarray,
    border: str,
    inv2sc: float,
    tile_h: int = 128,
    tile_w: int = 1024,  # round-2 sweep: 128x1024 at 4K (d=4: +40% over 512)
    uniform_alpha: bool = False,
    extend_to: tuple[int, int] | None = None,
):
    """Fused grid-construction kernel; see the module-level banner.

    extend_to=(R, C) (round-5, VERDICT #4 "d=2 glue"): emit the grid DIRECTLY
    in the slice kernel's padded slab layout -- (nc*K, R, C) with row 0 the
    edge-dup of cell 0 (the slice's lead cell -1), rows 1..hs the real cells,
    rows hs+1.. the edge-dup of cell hs-1, and likewise for columns -- so
    _slice_grid_pallas's full-grid jnp.pad copy (~150 MB of HBM traffic at
    4K/d=2) disappears. Values match the legacy build-then-pad path to the
    STORED-GRID bf16 contract (tests/test_fast.py, same as the fused kernel
    and sharded tests): the replicated rows/cols are fixed up in-kernel
    (same roll/where idiom as the fused kernel's edge_fix) and cells beyond
    hs+1/ws+1 -- which the slice only ever multiplies by structurally-zero
    upsample weights for valid pixels -- hold finite blur-of-edge-pad
    values; the only divergence is the one-cell input shift moving the blur
    band inside the dot contraction, whose ~1-f32-ulp reduction regrouping
    occasionally flips a stored cell one bf16 ulp.
    Caller must guarantee hs %% th != th-1 and ws %% tw != tw-1 (else the
    block holding cell hs cannot replicate into cell hs+1; use the legacy
    path -- see _grid_pipeline_planar's fallback)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, hs, ws = small.shape
    nc = 3 if uniform_alpha else 4  # output planes per level
    r = (len(taps) - 1) // 2
    rh = -(-r // 4) * 4
    lh = 128
    extend = extend_to is not None
    if extend:
        out_rows, out_cols = extend_to
        assert out_rows >= hs + 2 and out_cols >= ws + 2
    else:
        out_rows, out_cols = hs, ws
    # Output is bf16 (16-row sublane tiles): round the tile height to 16 so
    # small grids (tiny shards, heavy downsample) keep a Mosaic-legal output
    # block on the real chip.
    th = min(tile_h, -(-out_rows // 16) * 16)
    tw = min(tile_w, -(-out_cols // 128) * 128)
    nh, nw = -(-out_rows // th), -(-out_cols // tw)
    mode = "edge" if border == BorderPolicy.CLAMP else "constant"
    if extend:
        # Output row q maps to pooled cell q-1: shift the pad by one cell so
        # block i's DMA window (rows i*th .. i*th+th+2rh) centers output row
        # t on pooled row i*th + t - 1. Edge mode keeps every overhang cell
        # finite; the fixups below replace the ones that must be EXACT dups.
        assert hs % th != th - 1 and ws % tw != tw - 1
        padded = jnp.pad(
            small,
            (
                (0, 0),
                (rh + 1, nh * th + rh - 1 - hs),
                (lh + 1, nw * tw + lh - 1 - ws),
            ),
            mode=mode,
        )
        i_bnd, q_loc = hs // th, hs % th  # block/row of cell hs-1's dup source
        j_bnd, p_loc = ws // tw, ws % tw
    else:
        padded = jnp.pad(
            small,
            ((0, 0), (rh, rh + nh * th - hs), (lh, lh + nw * tw - ws)),
            mode=mode,
        )
    lim = jnp.stack([lmin, step], axis=1)  # (3, 2)
    eh, ew = th + 2 * r, tw + 2 * r  # extended region for the separable blur

    # Banded blur matrices: rows-blur = V @ x ((th, eh) band of taps), then
    # cols-blur = acc @ Hm ((ew, tw) band). On the MXU these replace
    # 2*len(taps) shifted-slice FMA sweeps per payload per level (the bulk of
    # the build kernel's VPU time, ~5 ms -> ~1.5 ms at 4K/d=2); the bf16
    # single-pass rounding (~1e-3 relative, applied to both numerator and
    # denominator so it largely divides out) is inside the turbo budget.
    v_np = np.zeros((th, eh), np.float32)
    for a, t in enumerate(taps):
        v_np[np.arange(th), np.arange(th) + a] += t
    h_np = np.zeros((ew, tw), np.float32)
    for b, t in enumerate(taps):
        h_np[np.arange(tw) + b, np.arange(tw)] += t
    v_mat = jnp.asarray(v_np)
    h_mat = jnp.asarray(h_np)

    def kern(small_hbm, lim_ref, v_ref, h_ref, out_ref, tile, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        if extend:
            # Blocks entirely beyond the dup cells (every output row maps to
            # a cell > hs, or every column to a cell > ws) exist only because
            # the slab layout over-extends the grid to the slice's aligned
            # DMA extent; the slice multiplies their cells by structurally-
            # zero upsample weights for every valid pixel, so they need only
            # be FINITE. Write zeros and skip the input DMA + blur math:
            # this is what makes the pad-free layout viable at d >= 4, where
            # the +128-col overhang adds a whole build-block column (the
            # round-5 d=4 A/B measured -19% when these blocks did full work).
            all_over = jnp.logical_or(i > i_bnd, j > j_bnd)

            @pl.when(all_over)
            def _zero_fill():
                out_ref[...] = jnp.zeros(
                    (nc * levels, th, tw), out_ref.dtype
                )

            run_body = pl.when(jnp.logical_not(all_over))
        else:
            run_body = lambda f: f()  # noqa: E731

        @run_body
        def _body():
            _kern_body(small_hbm, lim_ref, v_ref, h_ref, out_ref, tile, sem, i, j)

    def _kern_body(small_hbm, lim_ref, v_ref, h_ref, out_ref, tile, sem, i, j):
        cp = pltpu.make_async_copy(
            small_hbm.at[:, pl.ds(i * th, th + 2 * rh), pl.ds(j * tw, tw + 2 * lh)],
            tile,
            sem,
        )
        cp.start()
        cp.wait()
        r0, c0 = rh - r, lh - r
        ext = [tile[c, r0 : r0 + eh, c0 : c0 + ew] for c in range(4)]
        vm = v_ref[:]
        hm = h_ref[:]

        if extend:
            # Edge-dup fixups reproducing the legacy jnp.pad(mode="edge")
            # exactly: output row 0 (cell -1) := row 1 (cell 0, first block
            # only); rows past cell hs-1's slot := that slot (the block
            # holding it only -- later blocks keep finite blur-of-pad values
            # that valid pixels never read with nonzero weight); same for
            # columns. The roll amount is STATIC (the bf16 dynamic-rotate
            # Mosaic trap does not apply), and fixups run on the f32 values
            # before the bf16 store.
            wr = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
            wc_i = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
            is_top = i == 0
            is_bnd_r = i == i_bnd
            is_left = j == 0
            is_bnd_c = j == j_bnd

            def fix(x):
                x = jnp.where(
                    jnp.logical_and(wr == 0, is_top),
                    jnp.roll(x, -1, axis=0),
                    x,
                )
                x = jnp.where(
                    jnp.logical_and(wr > q_loc, is_bnd_r),
                    x[q_loc : q_loc + 1, :],
                    x,
                )
                x = jnp.where(
                    jnp.logical_and(wc_i == 0, is_left),
                    jnp.roll(x, -1, axis=1),
                    x,
                )
                x = jnp.where(
                    jnp.logical_and(wc_i > p_loc, is_bnd_c),
                    x[:, p_loc : p_loc + 1],
                    x,
                )
                return x

        else:

            def fix(x):
                return x

        def blur(x):
            # (eh, ew) -> (th, ew) -> (th, tw): two banded MXU matmuls
            # (single-pass bf16 via default dot precision).
            return jnp.dot(
                jnp.dot(vm, x, preferred_element_type=jnp.float32),
                hm,
                preferred_element_type=jnp.float32,
            )

        for k in range(levels):
            den = [None] * 3
            num = [None] * 3
            na = None
            for c in range(3):
                lv = lim_ref[c, 0] + lim_ref[c, 1] * np.float32(k)
                dcol = ext[c] - lv
                # exp2 with log2(e) folded into the constant: saves the
                # hidden scale-multiply inside the exp lowering per cell.
                wk = jnp.exp2(-(dcol * dcol) * jnp.float32(inv2sc * _LOG2E))
                den[c] = blur(wk)
                num[c] = blur(wk * ext[c])
                if c == 1 and not uniform_alpha:
                    na = blur(wk * ext[3])
            for c in range(3):
                out_ref[nc * k + c] = fix(
                    num[c] / jnp.maximum(den[c], 1e-20)
                ).astype(out_ref.dtype)
            if not uniform_alpha:
                out_ref[nc * k + 3] = fix(
                    na / jnp.maximum(den[1], 1e-20)
                ).astype(out_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nc * levels, th, tw), lambda i, j: (0, i, j)),
        # bf16 grid storage: the grid is consumed by the slice kernel's bf16
        # MXU matmuls anyway, so storing it bf16 halves the grid's HBM write,
        # the edge-pad copy, and the slab re-read (~1.2 ms at 4K/d=2) at no
        # additional precision cost on the turbo output.
        out_shape=jax.ShapeDtypeStruct(
            (nc * levels, out_rows, out_cols), jnp.bfloat16
        ),
        scratch_shapes=[
            pltpu.VMEM((4, th + 2 * rh, tw + 2 * lh), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_use_interpret(),
    )(padded, lim, v_mat, h_mat)


# ---------------------------------------------------------------------------
# TURBO for the layer-guided config (shaders/bialteral_layers.comp): the same
# per-channel bilateral grid, but range weights come from the LAYER (G-buffer
# guide) and the payload is the target image -- and the grid stays
# UNNORMALIZED (separate num/den planes) so per-layer partials accumulate
# across layers before one final divide, mirroring the exact two-pass
# accumulate-then-normalize structure (src/main.cpp:1608-1624, 1649-1652).
# Approximation vs the exact kernel: per-channel range weights (channel c of
# the output is guided by channel c of the layer; alpha rides green) instead
# of the joint-RGB weight, plus the grid quantization -- measured in
# tests/test_fast.py.
# ---------------------------------------------------------------------------


def _build_guided_grid_pallas(
    small_t: jnp.ndarray,  # (4, hs, ws) pooled target (payload)
    small_l: jnp.ndarray,  # (4, hs, ws) pooled layer (guide)
    lmin: jnp.ndarray,  # (3,) guide-channel grid minimum
    step: jnp.ndarray,  # (3,)
    levels: int,
    taps: np.ndarray,
    border: str,
    inv2sc: float,
    tile_h: int = 128,
    tile_w: int = 1024,  # round-2 sweep: 128x1024 at 4K (d=4: +40% over 512)
):
    """Per level k: 7 UNNORMALIZED planes [num_r num_g num_b num_a den_r
    den_g den_b], num_c = blur(w_k(guide_c) * payload_c), den_c =
    blur(w_k(guide_c)); alpha's num uses green's weights."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, hs, ws = small_t.shape
    r = (len(taps) - 1) // 2
    rh = -(-r // 4) * 4
    lh = 128
    # bf16 output planes tile as (16, 128): 16-row tile floor (see
    # _build_grid_pallas).
    th = min(tile_h, -(-hs // 16) * 16)
    tw = min(tile_w, -(-ws // 128) * 128)
    nh, nw = -(-hs // th), -(-ws // tw)
    mode = "edge" if border == BorderPolicy.CLAMP else "constant"

    def pad(x):
        return jnp.pad(
            x, ((0, 0), (rh, rh + nh * th - hs), (lh, lh + nw * tw - ws)), mode=mode
        )

    padded_t, padded_l = pad(small_t), pad(small_l)
    lim = jnp.stack([lmin, step], axis=1)  # (3, 2)
    eh, ew = th + 2 * r, tw + 2 * r

    v_np = np.zeros((th, eh), np.float32)
    for a, t in enumerate(taps):
        v_np[np.arange(th), np.arange(th) + a] += t
    h_np = np.zeros((ew, tw), np.float32)
    for b, t in enumerate(taps):
        h_np[np.arange(tw) + b, np.arange(tw)] += t
    v_mat = jnp.asarray(v_np)
    h_mat = jnp.asarray(h_np)

    def kern(t_hbm, l_hbm, lim_ref, v_ref, h_ref, out_ref, t_tile, l_tile, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        rows = pl.ds(i * th, th + 2 * rh)
        cols = pl.ds(j * tw, tw + 2 * lh)
        cpt = pltpu.make_async_copy(t_hbm.at[:, rows, cols], t_tile, sem.at[0])
        cpt.start()
        cpl = pltpu.make_async_copy(l_hbm.at[:, rows, cols], l_tile, sem.at[1])
        cpl.start()
        cpt.wait()
        cpl.wait()
        r0, c0 = rh - r, lh - r
        ext_t = [t_tile[c, r0 : r0 + eh, c0 : c0 + ew] for c in range(4)]
        ext_l = [l_tile[c, r0 : r0 + eh, c0 : c0 + ew] for c in range(3)]
        vm = v_ref[:]
        hm = h_ref[:]

        def blur(x):
            return jnp.dot(
                jnp.dot(vm, x, preferred_element_type=jnp.float32),
                hm,
                preferred_element_type=jnp.float32,
            )

        for k in range(levels):
            for c in range(3):
                lv = lim_ref[c, 0] + lim_ref[c, 1] * np.float32(k)
                dcol = ext_l[c] - lv
                wk = jnp.exp2(-(dcol * dcol) * jnp.float32(inv2sc * _LOG2E))
                out_ref[7 * k + c] = blur(wk * ext_t[c]).astype(out_ref.dtype)
                out_ref[7 * k + 4 + c] = blur(wk).astype(out_ref.dtype)
                if c == 1:
                    out_ref[7 * k + 3] = blur(wk * ext_t[3]).astype(out_ref.dtype)

    tile_shape = (4, th + 2 * rh, tw + 2 * lh)
    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7 * levels, th, tw), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((7 * levels, hs, ws), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM(tile_shape, jnp.float32),
            pltpu.VMEM(tile_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_use_interpret(),
    )(padded_t, padded_l, lim, v_mat, h_mat)


def _slice_guided_grid_pallas(
    guide: jnp.ndarray,  # (3, H, W) full-res LAYER rgb (padded to tiles)
    grid: jnp.ndarray,  # (7K, hs+2, ws+2) edge-padded num/den grid
    lmin: jnp.ndarray,
    inv_step: jnp.ndarray,
    levels: int,
    d: int,
    tile_h: int = 256,
    tile_w: int = 1024,  # round-3 sweep: 256x1024 at 4K
    pad_edge: bool = False,  # True: grid is RAW; fold the edge pad into the
    # alignment pad (one grid copy; see _slice_grid_pallas)
    cull_mask: bool = True,  # see _slice_grid_pallas
):
    """Tent-interpolate the unnormalized guided grid at full resolution:
    returns (7, H, W) = [wc_r wc_g wc_b wc_a nw_r nw_g nw_b] partials."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, h, w = guide.shape
    ghs, gws = tile_h // d, tile_w // d
    row_tile = 16 if grid.dtype == jnp.bfloat16 else 8
    slab_h = -(-(ghs + 2) // row_tile) * row_tile
    slab_w = -(-(gws + 2) // 128) * 128
    # Ragged grid, unpadded guide/out (see _slice_grid_pallas).
    nh, nw = -(-h // tile_h), -(-w // tile_w)
    ragged = (h % tile_h != 0) or (w % tile_w != 0)
    u_mat = jnp.asarray(_upsample_matrix(d, gws + 2, tile_w)).astype(grid.dtype)
    v_mat = jnp.asarray(_upsample_matrix(d, ghs + 2, tile_h).T).astype(grid.dtype)

    lead = 1 if pad_edge else 0
    th_tot = max((nh - 1) * ghs + slab_h, grid.shape[1] + 2 * lead)
    tw_tot = max((nw - 1) * gws + slab_w, grid.shape[2] + 2 * lead)
    grid_p = jnp.pad(
        grid,
        (
            (0, 0),
            (lead, th_tot - grid.shape[1] - lead),
            (lead, tw_tot - grid.shape[2] - lead),
        ),
        mode="edge",
    )
    lim = jnp.stack([lmin, inv_step], axis=1)  # (3, 2)

    def kern(guide_ref, grid_hbm, lim_ref, u_ref, v_ref, out_ref, slab, acc, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            grid_hbm.at[:, pl.ds(i * ghs, slab_h), pl.ds(j * gws, slab_w)],
            slab,
            sem,
        )
        cp.start()
        ts = []
        for c in range(3):
            t = (guide_ref[c] - lim_ref[c, 0]) * lim_ref[c, 1]
            ts.append(jnp.clip(t, 0.0, float(levels - 1)))
        # Per-tile level culling (exact; both variants -- see
        # _slice_grid_pallas's cull_mask note).
        if cull_mask and ragged:
            riota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
            ciota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
            valid = (riota < h - i * tile_h) & (ciota < w - j * tile_w)
            mid = jnp.float32((levels - 1) * 0.5)
            red = [jnp.where(valid, t, mid) for t in ts]
            tmins = [jnp.min(t) for t in red]
            tmaxs = [jnp.max(t) for t in red]
        else:
            tmins = []
            tmaxs = []
            for t in ts:
                m, M = jnp.min(t), jnp.max(t)
                tmins.append(jnp.where(m == m, m, jnp.float32(0.0)))
                tmaxs.append(jnp.where(M == M, M, jnp.float32(levels - 1)))
        cp.wait()
        um = u_ref[:]
        vm = v_ref[:]

        def upsample(plane):
            cell = slab[plane, 0 : ghs + 2, 0 : gws + 2]
            return jnp.dot(
                vm,
                jnp.dot(cell, um, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        def up_delta(k, plane):
            dcell = (
                slab[7 * (k + 1) + plane, 0 : ghs + 2, 0 : gws + 2]
                - slab[7 * k + plane, 0 : ghs + 2, 0 : gws + 2]
            )
            return jnp.dot(
                vm,
                jnp.dot(dcell, um, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        # Telescoped ramp-delta interpolation (see _slice_grid_pallas).
        for c in range(3):
            acc[c] = upsample(c)  # num_c base
            acc[4 + c] = upsample(4 + c)  # den_c base
            if c == 1:
                acc[3] = upsample(3)  # num_a base
        for k in range(levels - 1):
            for c in range(3):
                # Same three-way ramp split as _slice_grid_pallas.
                @pl.when((tmaxs[c] > k) & (tmins[c] < k + 1))
                def _ramp(k=k, c=c):
                    ramp = jnp.clip(ts[c] - k, 0.0, 1.0)
                    acc[c] += ramp * up_delta(k, c)  # num_c
                    acc[4 + c] += ramp * up_delta(k, 4 + c)  # den_c
                    if c == 1:  # alpha num rides green's ramp + culling
                        acc[3] += ramp * up_delta(k, 3)

                @pl.when(tmins[c] >= k + 1)  # implies tmax > k
                def _interior(k=k, c=c):
                    acc[c] += up_delta(k, c)
                    acc[4 + c] += up_delta(k, 4 + c)
                    if c == 1:
                        acc[3] += up_delta(k, 3)

        for p_idx in range(7):
            out_ref[p_idx] = acc[p_idx]

    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7, tile_h, tile_w), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((7, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((7 * levels, slab_h, slab_w), grid.dtype),
            pltpu.VMEM((7, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(guide, grid_p, lim, u_mat, v_mat)


def _fused_guided_pipeline_planar(
    t_planar: jnp.ndarray,  # (4, H, W) float32 target (payload)
    l_planar: jnp.ndarray,  # (4, H, W) float32 layer (guide)
    params,
    levels: int,
    d: int,
    tile_h: int,
    tile_w: int,
    cull_mask: bool = True,
) -> jnp.ndarray:
    """pool both -> (range reduce) -> ONE fused guided build+slice kernel.

    The guided analog of `_fused_grid_pipeline_planar`: per slice tile, DMA
    the pooled target+layer halo window, construct only the culling-needed
    7-plane grid levels in VMEM (num_r num_g num_b num_a den_r den_g den_b;
    same banded-matmul blur + bf16 rounding as `_build_guided_grid_pallas`),
    and tent-slice them with ramps from the full-res LAYER guide -- no 7K-
    plane grid HBM round-trip (the 42-plane bf16 grid is the largest HBM
    object in the two-kernel guided pipeline). Returns the (7, H, W) f32
    UNNORMALIZED partials of `_slice_guided_grid_pallas` so per-layer
    accumulation across layers is unchanged (src/main.cpp:1608-1624 parity
    structure). The telescoped sum is rebased at g_{floor(tmin)} per channel
    exactly as in the fused bilateral kernel (same two benign bf16
    divergence sources, tested at the same contract)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, h, w = t_planar.shape
    inv2sc = 0.5 / (params.sigma_color**2)
    mode = "edge" if params.border == BorderPolicy.CLAMP else "constant"
    hp = -(-h // d) * d
    wp = -(-w // d) * d
    t_p = jnp.pad(t_planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)
    l_p = jnp.pad(l_planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)
    small_t = _pool_pallas(t_p, d)
    small_l = _pool_pallas(l_p, d)
    hs, ws = hp // d, wp // d
    lmin = jnp.min(small_l[:3], axis=(1, 2))
    lmax = jnp.max(small_l[:3], axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)
    taps = _grid_taps(params.sigma_spatial, d)
    r = (len(taps) - 1) // 2

    ghs, gws = tile_h // d, tile_w // d
    wh, ww = ghs + 2, gws + 2
    nh, nw = -(-h // tile_h), -(-w // tile_w)
    ragged = (h % tile_h != 0) or (w % tile_w != 0)

    # One stacked (7, hs, ws) pooled array = one window DMA per tile:
    # planes 0-3 = pooled target (payload), 4-6 = pooled layer rgb (guide).
    stacked = jnp.concatenate([small_t, small_l[:3]], axis=0)
    rh2 = -(-(r + 1) // 4) * 4
    padded = jnp.pad(
        stacked,
        (
            (0, 0),
            (rh2, nh * ghs + rh2 - hs),
            (128, nw * gws + 128 - ws),
        ),
        mode=mode,
    )

    eh, ew = wh + 2 * r, ww + 2 * r
    v_np = np.zeros((wh, eh), np.float32)
    for a, t in enumerate(taps):
        v_np[np.arange(wh), np.arange(wh) + a] += t
    h_np = np.zeros((ew, ww), np.float32)
    for b, t in enumerate(taps):
        h_np[np.arange(ww) + b, np.arange(ww)] += t
    v_blur = jnp.asarray(v_np)
    h_blur = jnp.asarray(h_np)
    u_mat = jnp.asarray(_upsample_matrix(d, ww, tile_w)).astype(jnp.bfloat16)
    v_mat = jnp.asarray(_upsample_matrix(d, wh, tile_h).T).astype(jnp.bfloat16)

    q_last = hs - (nh - 1) * ghs
    p_last = ws - (nw - 1) * gws
    lim = jnp.stack([lmin, step, 1.0 / step], axis=1)  # (3, 3)

    def kern(
        guide_ref, small_hbm, lim_ref, vb_ref, hb_ref, u_ref, v_ref,
        out_ref, tile, cells, acc, sem,
    ):
        i, j = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            small_hbm.at[
                :, pl.ds(i * ghs, ghs + 2 * rh2), pl.ds(j * gws, gws + 256)
            ],
            tile,
            sem,
        )
        cp.start()
        ts = []
        for c in range(3):
            t = (guide_ref[c] - lim_ref[c, 0]) * lim_ref[c, 2]
            ts.append(jnp.clip(t, 0.0, float(levels - 1)))
        if cull_mask and ragged:
            riota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
            ciota = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
            valid = (riota < h - i * tile_h) & (ciota < w - j * tile_w)
            mid = jnp.float32((levels - 1) * 0.5)
            red = [jnp.where(valid, t, mid) for t in ts]
            tmins = [jnp.min(t) for t in red]
            tmaxs = [jnp.max(t) for t in red]
        else:
            tmins = []
            tmaxs = []
            for t in ts:
                m, M = jnp.min(t), jnp.max(t)
                tmins.append(jnp.where(m == m, m, jnp.float32(0.0)))
                tmaxs.append(jnp.where(M == M, M, jnp.float32(levels - 1)))
        ms = [jnp.floor(t) for t in tmins]
        cp.wait()
        vb = vb_ref[:]
        hb = hb_ref[:]
        um = u_ref[:]
        vm = v_ref[:]
        r0 = rh2 - 1 - r
        c0 = 128 - 1 - r
        ext_t = [tile[c, r0 : r0 + eh, c0 : c0 + ew] for c in range(4)]
        ext_l = [tile[4 + c, r0 : r0 + eh, c0 : c0 + ew] for c in range(3)]

        is_top = i == 0
        is_bot = i == nh - 1
        is_left = j == 0
        is_right = j == nw - 1
        wr = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0)
        wc_i = jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1)

        def blur(x):
            return jnp.dot(
                jnp.dot(vb, x, preferred_element_type=jnp.float32),
                hb,
                preferred_element_type=jnp.float32,
            )

        def edge_fix(cell):
            # Same in-kernel reproduction of the two-kernel path's grid edge
            # replication as _fused_grid_pipeline_planar.
            cell = jnp.where(
                jnp.logical_and(wr == 0, is_top),
                jnp.roll(cell, -1, axis=0),
                cell,
            )
            cell = jnp.where(
                jnp.logical_and(wr > q_last, is_bot),
                cell[q_last : q_last + 1, :],
                cell,
            )
            cell = jnp.where(
                jnp.logical_and(wc_i == 0, is_left),
                jnp.roll(cell, -1, axis=1),
                cell,
            )
            cell = jnp.where(
                jnp.logical_and(wc_i > p_last, is_right),
                cell[:, p_last : p_last + 1],
                cell,
            )
            return cell

        def upsample(cell_bf16):
            return jnp.dot(
                vm,
                jnp.dot(cell_bf16, um, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        # cells plane layout per parity slot: 0-2 num_rgb, 3 num_a, 4-6 den.
        for k in range(levels):
            fk = jnp.float32(k)
            for c in range(3):
                @pl.when(jnp.logical_and(fk >= ms[c], fk - 1.0 < tmaxs[c]))
                def _build(k=k, c=c):
                    lv = lim_ref[c, 0] + lim_ref[c, 1] * np.float32(k)
                    dcol = ext_l[c] - lv
                    wk = jnp.exp2(
                        -(dcol * dcol) * jnp.float32(inv2sc * _LOG2E)
                    )
                    cells[k % 2, c] = edge_fix(
                        blur(wk * ext_t[c]).astype(jnp.bfloat16)
                    )
                    cells[k % 2, 4 + c] = edge_fix(
                        blur(wk).astype(jnp.bfloat16)
                    )
                    if c == 1:
                        cells[k % 2, 3] = edge_fix(
                            blur(wk * ext_t[3]).astype(jnp.bfloat16)
                        )

                @pl.when(ms[c] == fk)
                def _base(k=k, c=c):
                    acc[c] = upsample(cells[k % 2, c])
                    acc[4 + c] = upsample(cells[k % 2, 4 + c])
                    if c == 1:
                        acc[3] = upsample(cells[k % 2, 3])

                if k > 0:
                    kk = k - 1

                    @pl.when(
                        jnp.logical_and(
                            tmaxs[c] > jnp.float32(kk),
                            tmins[c] < jnp.float32(kk + 1),
                        )
                    )
                    def _ramp(k=k, c=c, kk=kk):
                        ramp = jnp.clip(ts[c] - kk, 0.0, 1.0)
                        delta = cells[k % 2, c] - cells[(k + 1) % 2, c]
                        acc[c] += ramp * upsample(delta)
                        dden = cells[k % 2, 4 + c] - cells[(k + 1) % 2, 4 + c]
                        acc[4 + c] += ramp * upsample(dden)
                        if c == 1:
                            da = cells[k % 2, 3] - cells[(k + 1) % 2, 3]
                            acc[3] += ramp * upsample(da)

        for p_idx in range(7):
            out_ref[p_idx] = acc[p_idx]

    return pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7, tile_h, tile_w), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((7, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((7, ghs + 2 * rh2, gws + 256), jnp.float32),
            pltpu.VMEM((2, 7, wh, ww), jnp.bfloat16),
            pltpu.VMEM((7, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=_use_interpret(),
    )(l_planar[:3], padded, lim, v_blur, h_blur, u_mat, v_mat)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def cross_bilateral_layers_fast(
    target: jnp.ndarray,
    layer: jnp.ndarray,
    params=None,
    levels: int = 6,
    downsample: int = 2,
    fused: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TURBO cross-bilateral partials for ONE layer: (H, W, 4) target +
    (H, W, 4) layer -> (weightColor (H, W, 4), normWeight (H, W, 3)).

    Accumulate the partials over all layers, then finish with
    `normalize_layers_fast`. normWeight is PER-CHANNEL (the per-channel-guide
    approximation; the exact kernel's normWeight is one scalar from the joint
    RGB weight). Mirrors shaders/bialteral_layers.comp's role in the
    accumulate-then-normalize pipeline. `fused` selects the single-kernel
    build+slice path (default per `_default_guided_fused`)."""
    from ..config import LayersParams

    if params is None:
        params = LayersParams()
    t_planar = jnp.transpose(target.astype(jnp.float32), (2, 0, 1))
    l_planar = jnp.transpose(layer.astype(jnp.float32), (2, 0, 1))
    _, h, w = t_planar.shape
    d = max(1, downsample)
    if fused is None:
        fused = _default_guided_fused(d)
    if fused:
        dth, dtw = _default_slice_tile(d)
        tile_h = max(16 * d, min(dth, _round_up(h, 16 * d)))
        tile_w = max(128 * d, min(dtw, _round_up(w, 128 * d)))
        planes = _fused_guided_pipeline_planar(
            t_planar, l_planar, params, levels, d, tile_h, tile_w
        )
        return (
            jnp.transpose(planes[:4], (1, 2, 0)),
            jnp.transpose(planes[4:], (1, 2, 0)),
        )
    inv2sc = 0.5 / (params.sigma_color**2)
    mode = "edge" if params.border == BorderPolicy.CLAMP else "constant"

    l_rgb = l_planar[:3]

    hp = -(-h // d) * d
    wp = -(-w // d) * d
    t_p = jnp.pad(t_planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)
    l_p = jnp.pad(l_planar, ((0, 0), (0, hp - h), (0, wp - w)), mode=mode)
    small_t = _pool_pallas(t_p, d)
    small_l = _pool_pallas(l_p, d)
    # Pooled-layer grid range + t clipping in the slice kernel (see
    # _grid_pipeline_planar): one cheap reduce instead of a full-res pass.
    lmin = jnp.min(small_l[:3], axis=(1, 2))
    lmax = jnp.max(small_l[:3], axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)
    taps = _grid_taps(params.sigma_spatial, d)
    bth, btw = _default_build_tile(d)
    grid = _build_guided_grid_pallas(
        small_t,
        small_l,
        lmin,
        step,
        levels,
        taps,
        params.border,
        inv2sc,
        tile_h=bth,
        tile_w=btw,
    )

    # Same clamp + alignment floors as _grid_pipeline_planar; unpadded
    # guide/out (ragged boundary blocks are masked in the kernel); pad_edge
    # folds the grid edge pad into the slab alignment pad.
    dth, dtw = _default_slice_tile(d)
    tile_h = max(16 * d, min(dth, _round_up(h, 16 * d)))
    tile_w = max(128 * d, min(dtw, _round_up(w, 128 * d)))
    planes = _slice_guided_grid_pallas(
        l_rgb, grid, lmin, 1.0 / step, levels, d, tile_h, tile_w,
        pad_edge=True,
    )
    wc = jnp.transpose(planes[:4], (1, 2, 0))
    nw = jnp.transpose(planes[4:], (1, 2, 0))
    return wc, nw


@jax.jit
def normalize_layers_fast(
    wc: jnp.ndarray, nw: jnp.ndarray
) -> jnp.ndarray:
    """Final divide for the turbo layers pipeline: out_c = wc_c / nw_c
    (alpha divides by green's norm), magenta sentinel where the green norm
    is zero (the normalize.comp:36-43 analog for the per-channel grid)."""
    zero = nw[..., 1] == 0.0
    safe = jnp.where(nw == 0.0, 1.0, nw)
    out = jnp.stack(
        [
            wc[..., 0] / safe[..., 0],
            wc[..., 1] / safe[..., 1],
            wc[..., 2] / safe[..., 2],
            wc[..., 3] / safe[..., 1],
        ],
        axis=-1,
    )
    sentinel = jnp.asarray([1.0, 0.0, 1.0, 1.0], jnp.float32)
    return jnp.where(zero[..., None], sentinel, out)
