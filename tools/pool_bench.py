"""Microbench: mean-pool (4, H, W) by d on the last two axes — variants.

The reshape((4,h/d,d,w/d,d)).mean() form costs ~24 ms at 4K/d=2 on v5e (the
lane-axis split forces a relayout); this script times alternatives to pick
the _downsample implementation. Run: python tools/pool_bench.py [d]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def slope_time(fn, x0, iters=3, k=4):
    def run_k(kk):
        @jax.jit
        def f(x):
            def body(i, v):
                out = fn(v)
                return v + jnp.sum(out.ravel()[:1]) * jnp.float32(1e-30)

            return jnp.sum(jax.lax.fori_loop(0, kk, body, x).ravel()[:1])

        float(f(x0))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(x0))
        return (time.perf_counter() - t0) / iters

    t1, tk = run_k(1), run_k(k)
    return max((tk - t1) / (k - 1), 1e-9)


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(0, 1, (4, h, w)).astype(np.float32))

    inv = 1.0 / (d * d)

    def pool_reshape(v):
        return v.reshape(4, h // d, d, w // d, d).mean(axis=(-3, -1))

    def pool_strided(v):
        acc = None
        for i in range(d):
            for j in range(d):
                s = v[:, i::d, j::d]
                acc = s if acc is None else acc + s
        return acc * inv

    def pool_strided_rows_then_lanes(v):
        acc = None
        for i in range(d):
            s = v[:, i::d, :]
            acc = s if acc is None else acc + s
        acc2 = None
        for j in range(d):
            s = acc[:, :, j::d]
            acc2 = s if acc2 is None else acc2 + s
        return acc2 * inv

    def pool_reduce_window(v):
        s = jax.lax.reduce_window(
            v, 0.0, jax.lax.add, (1, d, d), (1, d, d), "VALID"
        )
        return s * inv

    def pool_conv(v):
        k = jnp.full((1, 1, d, d), inv, jnp.float32)
        return jax.lax.conv_general_dilated(
            v[:, None], k, (d, d), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )[:, 0]

    for name, fn in [
        ("reshape-mean", pool_reshape),
        ("d^2 strided slices", pool_strided),
        ("rows-then-lanes strided", pool_strided_rows_then_lanes),
        ("reduce_window", pool_reduce_window),
        ("conv stride-d", pool_conv),
    ]:
        try:
            t = slope_time(fn, x)
            print(f"{name:28s} {t*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
