"""Unit tests for the chiptime slope-timing harness (utils/chiptime.py).

The refeed chain is load-bearing for benchmark HONESTY: the turbo slice
kernel culls intensity levels per tile, so chaining outputs would measure
progressively smoothed frames and overstate throughput. These tests pin the
chain semantics on the CPU backend (timing values are meaningless here; the
chain mechanics are what's under test).
"""

import numpy as np
import pytest

from image_denoising_filter_tpu.utils import chiptime


def test_carry_chain_applies_fn_k_times():
    import jax.numpy as jnp

    x0 = jnp.zeros((4, 8, 16), jnp.float32)
    run = chiptime._chain_program(lambda x: x + 1.0, x0, (), refeed=False)
    # run returns the corner element of the final carry.
    assert float(run(5, x0)) == pytest.approx(5.0)
    assert float(run(1, x0)) == pytest.approx(1.0)


def test_refeed_chain_keeps_original_content():
    import jax.numpy as jnp

    x0 = jnp.full((4, 8, 16), 0.25, jnp.float32)
    run = chiptime._chain_program(lambda x: x + 1.0, x0, (), refeed=True)
    # Every chained application must see (numerically) the ORIGINAL content:
    # the carry's corner is original + sum(out[:1]) * 1e-30 ~= original.
    assert float(run(7, x0)) == pytest.approx(0.25, abs=1e-6)


def test_refeed_chain_is_data_dependent():
    """The corner poke must depend on each application's output (so the loop
    cannot be folded): a fn that returns a constant changes nothing, but the
    dependence path exists -- verified by tracing the jaxpr for a fori_loop."""
    import jax
    import jax.numpy as jnp

    x0 = jnp.ones((2, 4, 8), jnp.float32)
    run = chiptime._chain_program(lambda x: x * 2.0, x0, (), refeed=True)
    jaxpr = str(jax.make_jaxpr(lambda x: run(3, x))(x0))
    assert "while" in jaxpr or "scan" in jaxpr  # sequential loop survived


def test_slope_fit_mechanics():
    import jax.numpy as jnp

    x0 = jnp.ones((8, 128), jnp.float32)
    fit = chiptime.slope_time(
        lambda x: x * 1.0001, x0, ks=(1, 2, 4), repeats=2, auto_extend=False
    )
    assert fit.slope > 0
    assert set(fit.samples) == {1, 2, 4}
    assert all(len(v) == 2 for v in fit.samples.values())
    mpix, fit2 = chiptime.measure_mpix(
        lambda x: x * 1.0001, x0, n_pixels=8 * 128, ks=(1, 2), repeats=1,
        auto_extend=False,
    )
    assert mpix > 0


def test_slope_fit_auto_extend_adds_longer_chain():
    """When the fit spread exceeds the target (always true for a trivially
    fast fn on CPU wall-clock noise), auto_extend must sample one chain 2x
    the longest k and keep whichever fit has the lower spread (round-3
    VERDICT weak #6: rows near the resolution floor chain longer instead of
    publishing a noisy point)."""
    import jax.numpy as jnp

    x0 = jnp.ones((8, 128), jnp.float32)
    fit = chiptime.slope_time(
        lambda x: x * 1.0001, x0, ks=(1, 2, 4), repeats=2,
        auto_extend=True, spread_target=0.0,  # force the extension path
    )
    assert set(fit.samples) == {1, 2, 4, 8}
    assert len(fit.samples[8]) == 2
    assert len(fit.samples[1]) == 4  # the extension round resamples all ks


def test_with_output_k0_equals_one_application():
    """The round-5 gate contract: run(0, x, *extra)[1] must equal
    fn(x, *extra) EXACTLY (bit-for-bit) -- bench.py's 4K quality gates
    score this output against the exact kernels, so any chain-side
    perturbation would contaminate the gate."""
    import jax.numpy as jnp

    x0 = jnp.linspace(0.0, 1.0, 4 * 8 * 16).reshape(4, 8, 16).astype(
        jnp.float32
    )
    g = jnp.full((4, 8, 16), 0.5, jnp.float32)
    fn = lambda x, e: jnp.sin(x * 3.0) + e  # noqa: E731
    run = chiptime._chain_program(
        fn, x0, (g,), refeed=True, with_output=True
    )
    scalar, out = run(0, x0, g)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fn(x0, g)))
    # And on a DIFFERENT argument frame (the NLM/layers gates re-aim the
    # program at gate content; x is an argument, not a closure).
    x1 = x0 * 0.3 + 0.1
    _, out1 = run(0, x1, g)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(fn(x1, g)))


def test_with_output_pytree_fn():
    """fn may return a pytree (the NLM accumulate returns (wc, nw)); the
    chain's data dependence rides the first leaf and run(0, ...)[1]
    returns the full tuple."""
    import jax.numpy as jnp

    x0 = jnp.full((2, 4, 8), 0.25, jnp.float32)
    fn = lambda x: (x * 2.0, x + 1.0)  # noqa: E731
    run = chiptime._chain_program(fn, x0, (), refeed=True, with_output=True)
    scalar, (a, b) = run(3, x0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(x0) * 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(x0) + 1.0, atol=1e-6)


def test_slope_time_with_output_returns_program():
    import jax.numpy as jnp

    x0 = jnp.ones((8, 128), jnp.float32)
    fit, run = chiptime.slope_time(
        lambda x: x * 2.0, x0, ks=(1, 2), repeats=1, auto_extend=False,
        with_output=True,
    )
    assert fit.slope > 0
    np.testing.assert_allclose(
        np.asarray(run(0, x0)[1]), np.asarray(x0) * 2.0
    )


def test_slope_from_program_retimes_new_data():
    """The noise-content rows re-time the render row's compiled program on a
    different frame: same avals, no rebuild."""
    import jax.numpy as jnp

    x0 = jnp.ones((8, 128), jnp.float32)
    fit, run = chiptime.slope_time(
        lambda x: x * 2.0, x0, ks=(1, 2), repeats=1, auto_extend=False,
        with_output=True,
    )
    x1 = jnp.full((8, 128), 3.0, jnp.float32)
    fit2 = chiptime.slope_from_program(
        run, x1, ks=(1, 2), repeats=2, auto_extend=False
    )
    assert fit2.slope > 0
    assert all(len(v) == 2 for v in fit2.samples.values())
