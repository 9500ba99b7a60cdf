"""On-chip validation + microbenchmark of the Pallas kernels with full
reference parameters (radius-20 bilateral, s=7/p=3 NLM).

Run directly on a machine with a TPU attached (no pytest conftest, so the axon
backend stays active):  python tools/tpu_check.py [--size 1080p|4k|small]
"""

import argparse
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="small", choices=["small", "1080p", "4k"])
    ap.add_argument("--check", action="store_true", help="compare vs NumPy oracle")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--temporal", type=int, default=0, metavar="F",
        help="also time the flagship temporal-NLM pipeline over F frames",
    )
    args = ap.parse_args()

    import jax

    from image_denoising_filter_tpu.utils import compile_cache

    compile_cache.enable()
    print("backend:", jax.default_backend(), jax.devices())

    from image_denoising_filter_tpu.config import BilateralParams, NlmParams
    from image_denoising_filter_tpu.ops import bilateral, nlm_accumulate, normalize
    from image_denoising_filter_tpu.ops import reference as ref

    shapes = {"small": (96, 128), "1080p": (1080, 1920), "4k": (2160, 3840)}
    h, w = shapes[args.size]
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    img2 = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)

    bp = BilateralParams()  # radius 20, the reference GPU params
    nlp = NlmParams()  # s=7, p=3, h=0.5

    import jax.numpy as jnp

    def timeit(name, chain_fn, x0, *extra):
        # Through the tunneled backend every host fence costs ~30 ms, so we
        # chain K kernel applications in one jitted fori_loop (data-dependent)
        # and take the slope between K=1 and K: the per-call roundtrip cancels.
        def run_k(k):
            @jax.jit
            def f(x, *e):
                out = jax.lax.fori_loop(0, k, lambda i, v: chain_fn(v, *e), x)
                return jnp.sum(out[0, 0])
            float(f(x0, *extra))  # compile+warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(f(x0, *extra))
            return (time.perf_counter() - t0) / args.iters

        k = 4
        t1, tk = run_k(1), run_k(k)
        dt = max((tk - t1) / (k - 1), 1e-9)
        mpix = h * w / dt / 1e6
        print(
            f"{name:28s} {dt * 1e3:9.3f} ms   {mpix:10.1f} Mpix/s   "
            f"(roundtrip {max(t1 - dt, 0) * 1e3:.1f} ms)"
        )
        return chain_fn(x0, *extra)

    dimg = jax.device_put(img)
    dimg2 = jax.device_put(img2)

    out_b = timeit("bilateral r=20 (pallas)", lambda x: bilateral(x, bp), dimg)
    out_n = timeit(
        "nlm s=7 p=3 (pallas)",
        lambda nb, tgt: nlm_accumulate(tgt, nb, nlp)[0],
        dimg2,
        dimg,
    )

    if args.temporal:
        from image_denoising_filter_tpu.models import TemporalNlmDenoiser

        frames = jax.device_put(
            rng.uniform(0, 1, (args.temporal, h, w, 4)).astype(np.float32)
        )
        model = TemporalNlmDenoiser(nlp)

        def run_temporal(k, iters=2):
            # chain the model output back in as the next target: the per-call
            # fence roundtrip cancels in the K=1 -> K slope
            @jax.jit
            def fence(t, f):
                out = jax.lax.fori_loop(0, k, lambda i, v: model(v, f), t)
                return jnp.sum(out[0, 0])

            float(fence(dimg, frames))
            t0 = time.perf_counter()
            for _ in range(iters):
                float(fence(dimg, frames))
            return (time.perf_counter() - t0) / iters

        dt = max(run_temporal(3) - run_temporal(1), 1e-9) / 2
        fps = 1.0 / dt
        print(
            f"temporal NLM {args.temporal}f {args.size:6s} {dt * 1e3:9.1f} ms   "
            f"{fps:6.2f} denoised frames/s   "
            f"{args.temporal * h * w / dt / 1e6:8.1f} Mpix/s accumulated"
        )

    if args.check:
        # fused turbo pipeline (TPU-only branch) vs the exact oracle, on
        # structured noisy content (its use case; on iid full-range noise any
        # grid method scores low because the exact filter barely smooths)
        from image_denoising_filter_tpu.ops import bilateral_fast

        th_, tw_ = 256, 640
        yy, xx = np.mgrid[0:th_, 0:tw_].astype(np.float32)
        scene = np.stack(
            [
                0.5 + 0.35 * np.sin(xx / 25),
                0.45 + 0.35 * np.cos(yy / 20),
                np.where((xx // 48 + yy // 32) % 2 == 0, 0.75, 0.25).astype(np.float32),
                np.ones((th_, tw_), np.float32),
            ],
            -1,
        )
        noisy = np.clip(
            scene + rng.normal(0, 0.06, scene.shape) * [1, 1, 1, 0], 0, 1
        ).astype(np.float32)
        tgot = np.asarray(bilateral_fast(jax.device_put(noisy), bp, 8, 2))
        twant = ref.bilateral_reference(noisy, bp)
        tdb = ref.psnr(tgot[..., :3], twant[..., :3])
        status = "OK" if tdb >= 35.0 else "LOW"
        print(f"turbo (fused) vs exact oracle: {tdb:.1f} dB [{status}]")

        # turbo NLM (stride-2 + bf16 taps) vs the exact NLM on the same scene
        from image_denoising_filter_tpu.config import NlmParams as _NP
        from image_denoising_filter_tpu.config import TilingConfig as _TC

        noisy2 = np.clip(
            scene + rng.normal(0, 0.06, scene.shape) * [1, 1, 1, 0], 0, 1
        ).astype(np.float32)
        nd, nd2 = jax.device_put(noisy), jax.device_put(noisy2)
        n_exact = np.asarray(normalize(*nlm_accumulate(nd, nd2, nlp)))
        n_turbo = np.asarray(
            normalize(
                *nlm_accumulate(
                    nd, nd2, _NP(search_stride=2), _TC(compute_dtype="bfloat16")
                )
            )
        )
        ndb = ref.psnr(n_turbo[..., :3], n_exact[..., :3])
        status = "OK" if ndb >= 35.0 else "LOW"
        print(f"turbo NLM (stride2+bf16) vs exact: {ndb:.1f} dB [{status}]")

        # turbo layers (guided grid) vs the exact layers two-pass pipeline
        from image_denoising_filter_tpu.config import LayersParams as _LP
        from image_denoising_filter_tpu.ops import (
            cross_bilateral_layers,
            cross_bilateral_layers_fast,
            normalize_layers_fast,
        )

        lp_ = _LP()
        lwc, lnw = cross_bilateral_layers(nd, nd2, lp_)
        l_exact = np.asarray(normalize(lwc, lnw))
        fwc, fnw = cross_bilateral_layers_fast(nd, nd2, lp_, 8, 2)
        l_turbo = np.asarray(normalize_layers_fast(fwc, fnw))
        ldb = ref.psnr(l_turbo[..., :3], l_exact[..., :3])
        status = "OK" if ldb >= 35.0 else "LOW"
        print(f"turbo layers (guided grid) vs exact: {ldb:.1f} dB [{status}]")

        want = ref.bilateral_reference(img, bp)
        err = np.abs(np.asarray(out_b) - want).max()
        ps = ref.psnr(np.asarray(out_b), want)
        print(f"bilateral vs oracle: maxerr={err:.3e} psnr={ps:.1f} dB")
        wwc, wnw = ref.nlm_reference(img, img2, nlp)
        got_n = np.asarray(out_n)
        err = np.abs(got_n - wwc).max() / max(1.0, np.abs(wwc).max())
        print(f"nlm wc vs oracle: relerr={err:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
