"""Round-2 TPU micro-probes: measure the primitive costs that set the kernel
designs (VPU op throughput inside a Pallas kernel, exp cost, shifted-slice
cost, turbo stage breakdown). Run on the real chip:

    python tools/probe_r2.py [probe ...]

Each probe prints one line; slope-timed (K-chained fori_loop) to cancel the
~30 ms tunnel roundtrip per host fence.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_denoising_filter_tpu.utils import compile_cache

compile_cache.enable()

H, W = 2048, 4096  # 8.4 Mpix plane
TH, TW = 256, 512


def slope_time(fn, x0, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x):
            out = jax.lax.fori_loop(0, kk, lambda i, v: fn(v), x)
            return jnp.sum(out.ravel()[0:1])

        float(f(x0))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(x0))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def _plane_call(kernel, halo_rows=0, halo_lanes=0):
    """pallas_call over a (H, W) plane with optional halo DMA (ANY memspace)."""
    gh, gw = H // TH, W // TW
    if halo_rows or halo_lanes:
        spec = [pl.BlockSpec(memory_space=pl.ANY)]
        scratch = [
            pltpu.VMEM((TH + 2 * halo_rows, TW + 2 * halo_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        spec = [pl.BlockSpec((TH, TW), lambda i, j: (i, j))]
        scratch = []
    return pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=spec,
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


def probe_fma(n_ops: int):
    """n_ops chained fmas per element -> effective VPU Tflop/s (1 fma = 1 op)."""

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        a = jnp.float32(1.000001)
        b = jnp.float32(1e-7)
        for _ in range(n_ops):
            v = v * a + b
        o_ref[:] = v

    call = _plane_call(kernel)
    x = jnp.ones((H, W), jnp.float32)
    dt = slope_time(call, x)
    ops = n_ops * H * W
    print(f"fma n={n_ops}: {dt*1e3:.3f} ms, {ops/dt/1e12:.3f} Tops/s, {dt/ops*1e12:.3f} ps/op")
    return dt


def probe_ilp(n_ops: int, n_chains: int):
    """n_chains independent fma chains, n_ops deep -> real VPU peak with ILP."""

    def kernel(x_ref, o_ref):
        base = x_ref[:]
        a = jnp.float32(1.000001)
        chains = [base * jnp.float32(1.0 + 0.001 * c) for c in range(n_chains)]
        for _ in range(n_ops):
            chains = [v * a + base for v in chains]
        acc = chains[0]
        for v in chains[1:]:
            acc = acc + v
        o_ref[:] = acc

    call = _plane_call(kernel)
    x = jnp.ones((H, W), jnp.float32)
    dt = slope_time(call, x)
    ops = n_ops * n_chains * H * W
    print(
        f"ilp chains={n_chains} n={n_ops}: {dt*1e3:.3f} ms, "
        f"{ops/dt/1e12:.3f} Tops/s"
    )
    return dt


def probe_exp(n_exp: int):
    """n_exp chained exps per element -> cost of one exp in fma-equivalents."""

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        for _ in range(n_exp):
            v = jnp.exp(v * jnp.float32(-0.1))
        o_ref[:] = v

    call = _plane_call(kernel)
    x = jnp.ones((H, W), jnp.float32)
    dt = slope_time(call, x)
    print(f"exp n={n_exp}: {dt*1e3:.3f} ms, {n_exp*H*W/dt/1e12:.3f} Texp/s")
    return dt


def probe_lane_slice(n: int, off: int):
    """n chained (lane-shifted slice + add) on a haloed tile."""
    lh = 128

    def kernel(x_hbm, o_ref, tile, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TH, TH), pl.ds(j * TW, TW + 2 * lh)], tile, sem
        )
        cp.start()
        cp.wait()
        plane = tile[:]
        v = plane[:, lh : lh + TW]
        for k in range(n):
            o = lh + ((k * off) % 7) + 1
            v = v + plane[:, o : o + TW]
        o_ref[:] = v

    x = jnp.ones((H, W + 2 * lh), jnp.float32)
    gh, gw = H // TH, W // TW
    callp = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH, TW + 2 * lh), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def chained(v):
        return callp(x.at[0, 0].add(v[0, 0] * 0))

    dt = slope_time(chained, jnp.ones((H, W), jnp.float32))
    ops = n * H * W
    print(f"lane-slice+add n={n}: {dt*1e3:.3f} ms, {dt/ops*1e12:.3f} ps/(slice+add)")
    return dt


def probe_2d_slice(n: int):
    """n chained (sublane+lane shifted slice + add)."""
    lh, rh = 128, 8

    def kernel(x_hbm, o_ref, tile, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TH, TH + 2 * rh), pl.ds(j * TW, TW + 2 * lh)], tile, sem
        )
        cp.start()
        cp.wait()
        plane = tile[:]
        v = plane[rh : rh + TH, lh : lh + TW]
        for k in range(n):
            ro = rh + (k % 5) + 1
            co = lh + (k % 7) + 1
            v = v + plane[ro : ro + TH, co : co + TW]
        o_ref[:] = v

    gh, gw = H // TH, W // TW
    callp = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * rh, TW + 2 * lh), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    x = jnp.ones((H + 2 * rh, W + 2 * lh), jnp.float32)

    def chained(v):
        return callp(x.at[0, 0].add(v[0, 0] * 0))

    dt = slope_time(chained, jnp.ones((H, W), jnp.float32))
    ops = n * H * W
    print(f"2d-slice+add n={n}: {dt*1e3:.3f} ms, {dt/ops*1e12:.3f} ps/(slice+add)")
    return dt


def slope_time_fixed(call, x_fixed, iters=3, k=4):
    """Slope-time a stage whose output shape differs from its input: carry the
    OUTPUT through the fori_loop and inject a non-foldable dependence into the
    fixed input each iteration."""

    def run_k(kk):
        @jax.jit
        def f(v0):
            def body(i, v):
                dep = v.ravel()[0] * jnp.float32(1e-30)
                return call(x_fixed.at[(0,) * x_fixed.ndim].add(dep))

            out = jax.lax.fori_loop(0, kk, body, v0)
            return jnp.sum(out.ravel()[0:1])

        v0 = call(x_fixed)
        float(f(v0))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(v0))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def probe_turbo(d: int = 2):
    """Stage breakdown of the turbo bilateral at 4K."""
    from image_denoising_filter_tpu.config import BilateralParams
    from image_denoising_filter_tpu.ops import fast

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.uniform(0, 1, (h, w, 4)).astype(np.float32))
    params = BilateralParams(uniform_alpha=True)
    levels = 8

    full = functools.partial(fast.bilateral_fast, params=params, levels=levels, downsample=d)
    dt_full = slope_time(lambda x: full(x), img)
    print(f"turbo full d={d}: {dt_full*1e3:.2f} ms = {h*w/dt_full/1e6:.0f} Mpix/s")

    import math

    r = params.effective_radius

    @jax.jit
    def prep(x):
        planar = jnp.transpose(x, (2, 0, 1))
        hp = -(-h // d) * d
        wp = -(-w // d) * d
        pp = jnp.pad(planar, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
        return fast._downsample(pp, d)

    dt_prep = slope_time_fixed(prep, img)
    print(f"turbo prep (transpose+pad+pool): {dt_prep*1e3:.2f} ms")

    small = prep(img)
    rgbp = jnp.transpose(img, (2, 0, 1))[:3]
    lmin = jnp.min(small[:3], axis=(1, 2))
    lmax = jnp.max(small[:3], axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / (levels - 1)
    taps = fast._gauss_taps(params.sigma_spatial / d, max(1, int(math.ceil(r / d))))

    @jax.jit
    def build(sm):
        return fast._build_grid_pallas(sm, lmin, step, levels, taps, params.border, 0.5 / params.sigma_color**2)

    g = build(small)
    dt_build = slope_time_fixed(build, small)
    print(f"turbo grid build: {dt_build*1e3:.2f} ms  (grid shape {g.shape})")

    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1)), mode="edge")
    tile_h, tile_w = 128, 512
    hp2 = -(-h // tile_h) * tile_h
    wp2 = -(-w // tile_w) * tile_w
    guide = jnp.pad(rgbp, ((0, 0), (0, hp2 - h), (0, wp2 - w)), mode="edge")

    @jax.jit
    def slc(gd):
        return fast._slice_grid_pallas(gd, gp, lmin, 1.0 / step, levels, d, tile_h, tile_w)

    dt_slice = slope_time_fixed(slc, guide)
    print(f"turbo grid slice: {dt_slice*1e3:.2f} ms")
    print(f"  (minmax + pads + final transpose: remainder {1e3*(dt_full-dt_prep-dt_build-dt_slice):.2f} ms)")


PROBES = {
    "fma": lambda: (probe_fma(64), probe_fma(256)),
    "ilp": lambda: (probe_ilp(64, 4), probe_ilp(64, 8)),
    "exp": lambda: (probe_exp(16), probe_exp(64)),
    "slice": lambda: (probe_lane_slice(64, 1), probe_2d_slice(64)),
    "turbo": probe_turbo,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for nm in names:
        PROBES[nm]()
