"""High-resolution device timing through the tunneled backend.

The reference reads per-dispatch device time from Vulkan timestamp queries
(src/main.cpp:1095-1102); nothing similar is exposed through this tunnel, and
every host fence costs ~30 ms with several ms of jitter (block_until_ready
does not even fence -- see CLAUDE.md).  The only trustworthy device timing is
the K-chain slope: jit ONE program that applies the kernel K times in a
data-dependent fori_loop, time it for several K values, and fit
time(K) = a + b*K by least squares.  The roundtrip and dispatch overheads land
in `a`; `b` is pure device time per application.

This module is the single shared implementation (bench.py and tools/ use it)
so resolution fixes land everywhere at once.  Resolution: with ks=(1, 8, 32)
and 5 repeats per k, the slope resolves ~1.5 ms pipelines to <10% run-to-run
spread (measured, docs/PERFORMANCE.md round-3 timing section); sub-0.5 ms
pipelines need ks up to 64+.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SlopeFit:
    """Least-squares fit of time(K) = intercept + slope*K."""

    slope: float  # seconds per chained application (the device time)
    intercept: float  # host roundtrip + dispatch overhead
    spread: float  # relative spread of per-k repeat medians around the fit
    samples: dict  # k -> list of wall times (seconds)

    def mpix_s(self, n_pixels: int) -> float:
        return n_pixels / self.slope / 1e6


def _chain_program(
    fn: Callable, x0, extra, refeed: bool, with_output: bool = False
) -> Callable:
    """One jitted program applying fn k times, sequential by construction.

    refeed=True re-feeds the ORIGINAL content every application (one corner
    element carries the data dependence; the in-place dynamic-update keeps
    the rest of the buffer untouched). Required for content-dependent
    kernels (per-tile level culling!): chaining outputs would measure
    progressively smoother frames and overstate throughput. refeed=False
    chains outputs directly (data-independent kernels, matched shapes).

    fn may return any pytree (e.g. an (accumulated, weights) pair); the data
    dependence rides the first leaf.

    with_output=True: after the loop, fn is applied ONE more time to the
    carry and the program returns (fence_scalar, final_output). The extra
    application is a per-run constant, so it lands in the fitted INTERCEPT
    and leaves the slope untouched -- and `run(0, x, *extra)[1]` is exactly
    fn(x, *extra), letting quality gates reuse the MEASURED program instead
    of loading a second unchained executable through the tunnel (round-5
    bench lesson: each distinct 4K program costs up to hundreds of seconds
    of executable load on slow sessions)."""

    def _first_leaf(out):
        return jax.tree_util.tree_leaves(out)[0]

    @jax.jit
    def run(k, x, *e):
        if refeed:
            idx = (0,) * x.ndim
            corner = jax.lax.dynamic_slice(x, idx, (1,) * x.ndim)

            def body(i, carry):
                out = _first_leaf(fn(carry, *e))
                poke = corner + (jnp.sum(out.ravel()[:1]) * 1e-30).astype(
                    x.dtype
                )
                return jax.lax.dynamic_update_slice(carry, poke, idx)

        else:

            def body(i, v):
                out = _first_leaf(fn(v, *e))
                if out.shape == x.shape and out.dtype == x.dtype:
                    return out
                # Keep the carry type closed but data-dependent on `out` so
                # the loop cannot be folded or reordered.
                return v + (jnp.sum(out.ravel()[:1]) * 1e-30).astype(x.dtype)

        carry = jax.lax.fori_loop(0, k, body, x)
        if with_output:
            final = fn(carry, *e)
            return jnp.sum(_first_leaf(final).ravel()[:1]), final
        return jnp.sum(carry.ravel()[:1])

    return run


def _fit(samples: dict) -> SlopeFit:
    meds = {k: sorted(v)[len(v) // 2] for k, v in samples.items()}
    ks = sorted(meds)
    n = len(ks)
    sx = sum(ks)
    sy = sum(meds.values())
    sxx = sum(k * k for k in ks)
    sxy = sum(k * meds[k] for k in ks)
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    resid = [meds[k] - (intercept + slope * k) for k in ks]
    scale = max(slope * max(ks), 1e-12)
    spread = math.sqrt(sum(r * r for r in resid) / n) / scale
    return SlopeFit(
        slope=max(slope, 1e-9), intercept=intercept, spread=spread, samples=samples
    )


def _sample_program(
    run: Callable,
    x0,
    extra,
    ks: Sequence[int],
    repeats: int,
    auto_extend: bool,
    spread_target: float,
    fenced: bool,
) -> SlopeFit:
    """Warm + sample an existing chain program and fit the slope. `fenced`
    says whether run returns a bare scalar or a (scalar, output) pair."""

    def fence(k):
        r = run(k, x0, *extra)
        float(r[0] if fenced else r)

    # Compile once (k dynamic) and warm the path. float() fences for real
    # through the tunnel (block_until_ready does not).
    fence(max(ks))

    samples: dict[int, list[float]] = {k: [] for k in ks}
    for _ in range(repeats):
        for k in ks:  # interleave so drift spreads evenly across k values
            t0 = time.perf_counter()
            fence(k)
            samples[k].append(time.perf_counter() - t0)

    fit = _fit(samples)
    if auto_extend and fit.spread > spread_target:
        k_ext = 2 * max(ks)
        fence(k_ext)  # warm the longer chain's first fence
        samples.setdefault(k_ext, [])
        for _ in range(repeats):
            for k in (*ks, k_ext):
                t0 = time.perf_counter()
                fence(k)
                samples[k].append(time.perf_counter() - t0)
        refit = _fit(samples)
        if refit.spread < fit.spread:
            fit = refit
    return fit


def slope_time(
    fn: Callable,
    x0,
    *extra,
    ks: Sequence[int] = (1, 8, 32),
    repeats: int = 5,
    refeed: bool = True,
    auto_extend: bool = True,
    spread_target: float = 0.05,
    with_output: bool = False,
):
    """Fit per-application device time for `fn` by the K-chain slope method.

    fn(x, *extra) must be jit-traceable; x0 is both the seed carry and the
    shape/dtype of the loop state. `k` is a DYNAMIC argument to one compiled
    program, so adding k values costs no extra compiles. refeed (default)
    re-feeds the original content every chained application -- see
    _chain_program; pass refeed=False only for kernels whose cost is provably
    content-independent AND whose output matches the input shape.

    auto_extend (round-3 VERDICT weak #6): when the fit's relative spread
    exceeds `spread_target` (rows near the method's ~30 ms roundtrip-jitter
    resolution floor: the round-3 d=8 row showed 14% cross-run spread), one
    more repeat round is sampled at the existing ks plus a chain 2x the
    longest -- longer chains pull the slope out of the jitter -- and the
    better-spread fit wins. k is dynamic, so the longer chain costs no
    compile, only its own run time.

    with_output=True: returns (fit, run) where run(k, x, *extra) is the
    compiled chain program returning (fence_scalar, fn_output) -- so
    run(0, x, *extra)[1] == fn(x, *extra) exactly, reusing the measured
    executable for quality gates, and `slope_from_program` can re-time the
    SAME program on different argument data (e.g. a noise-content row)
    without another executable load. Otherwise returns the fit alone.
    """
    run = _chain_program(fn, x0, extra, refeed, with_output)
    fit = _sample_program(
        run, x0, extra, ks, repeats, auto_extend, spread_target, with_output
    )
    if with_output:
        return fit, run
    return fit


def slope_from_program(
    run: Callable,
    x0,
    *extra,
    ks: Sequence[int] = (1, 8, 32),
    repeats: int = 5,
    auto_extend: bool = True,
    spread_target: float = 0.05,
) -> SlopeFit:
    """Re-time an existing chain program (from slope_time(with_output=True))
    on new argument data. The program is shape-specialized, so x0/extra must
    match the original avals; no compile and no executable load happen --
    this is how bench.py measures noise-content rows for free after the
    render-content unit already paid the program load."""
    return _sample_program(
        run, x0, extra, ks, repeats, auto_extend, spread_target, True
    )


def measure_mpix(
    fn: Callable,
    x0,
    *extra,
    n_pixels: int,
    ks=(1, 8, 32),
    repeats: int = 5,
    refeed: bool = True,
    **kw,
) -> tuple[float, SlopeFit]:
    fit = slope_time(
        fn, x0, *extra, ks=ks, repeats=repeats, refeed=refeed, **kw
    )
    return fit.mpix_s(n_pixels), fit


@dataclasses.dataclass
class ABResult:
    """Interleaved A/B comparison result. `samples[name]` holds one Mpix/s
    figure per interleaved round; `medians[name]` their median."""

    names: tuple
    samples: dict  # name -> list of per-round Mpix/s
    medians: dict  # name -> median Mpix/s

    def delta_pct(self, a: str, b: str) -> float:
        """Median speedup of a over b, in percent."""
        return (self.medians[a] / self.medians[b] - 1.0) * 100.0

    def verdict(self, a: str, b: str, min_delta_pct: float = 3.0) -> str:
        """Conservative call between two variants: a winner is declared only
        when every interleaved round agrees on the sign AND the median delta
        clears `min_delta_pct`; otherwise 'wash'. With a single round the
        method cannot separate a <10% delta from session drift (the round-4
        cull_mask lesson: +12.6% in one capture, a wash interleaved), so it
        REFUSES: any sub-10% single-round delta returns 'unreliable'."""
        deltas = [
            (sa / sb - 1.0) * 100.0
            for sa, sb in zip(self.samples[a], self.samples[b])
        ]
        med = self.delta_pct(a, b)
        if len(deltas) < 2 and abs(med) < 10.0:
            return "unreliable (single round, |delta| < 10%: rerun interleaved)"
        if abs(med) < min_delta_pct:
            return "wash"
        if all(d > 0 for d in deltas):
            return a
        if all(d < 0 for d in deltas):
            return b
        return "wash (sign flips across rounds)"

    def summary(self, base: str | None = None) -> str:
        base = base or self.names[0]
        lines = []
        for name in self.names:
            per_round = "/".join(f"{s:.0f}" for s in self.samples[name])
            rel = (
                ""
                if name == base
                else f"  ({self.delta_pct(name, base):+.1f}% vs {base})"
            )
            lines.append(
                f"{name}: median {self.medians[name]:.0f} Mpix/s "
                f"[rounds {per_round}]{rel}"
            )
        for name in self.names:
            if name != base:
                lines.append(f"verdict {name} vs {base}: {self.verdict(name, base)}")
        return "\n".join(lines)


def ab_compare(
    variants: dict,  # name -> fn(x, *extra)
    x0,
    *extra,
    n_pixels: int,
    ks: Sequence[int] = (1, 8, 32),
    rounds: int = 3,
    repeats: int = 3,
    refeed: bool = True,
    verbose: bool = True,
    **kw,
) -> ABResult:
    """Interleaved A/B(/C...) throughput comparison -- the ONLY sanctioned
    way to compare variants across programs on this backend (round-4 drift
    lesson, docs/PERFORMANCE.md: cross-program throughput drifts +-5-7%
    between captures even for identical code, so any single-capture delta
    under ~10% is noise). Visits every variant once per round, A/B/A/B, so
    drift spreads evenly; each visit is a full K-chain slope fit. Use
    `ABResult.verdict()` to decide -- it refuses single-round sub-10% calls
    and demands sign-consistency across rounds."""
    names = tuple(variants)
    samples: dict = {name: [] for name in names}
    # No separate warm pass needed: slope_time compiles and warms its chain
    # program before sampling, and the slope method is insensitive to
    # when compiles happen between measurements.
    for r in range(rounds):
        for name, fn in variants.items():
            fit = slope_time(
                fn, x0, *extra, ks=ks, repeats=repeats, refeed=refeed, **kw
            )
            mpix = fit.mpix_s(n_pixels)
            samples[name].append(mpix)
            if verbose:
                print(
                    f"round {r} {name}: {mpix:8.0f} Mpix/s "
                    f"(spread {fit.spread * 100:.1f}%)",
                    flush=True,
                )
    medians = {
        name: sorted(v)[len(v) // 2] for name, v in samples.items()
    }
    res = ABResult(names=names, samples=samples, medians=medians)
    if verbose:
        print(res.summary(), flush=True)
    return res
