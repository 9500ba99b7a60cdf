"""Pallas and XLA kernel tests vs the NumPy oracles.

Pallas kernels run in interpret mode on the CPU backend (conftest forces
JAX_PLATFORMS=cpu); the same code compiles via Mosaic on a real TPU (exercised
by bench.py and tools/tpu_check.py). Interpret mode executes op-by-op, so these
tests use small images and radii -- the kernel math is radius-agnostic.
"""

import numpy as np
import pytest

from image_denoising_filter_tpu.config import (
    BilateralParams,
    BorderPolicy,
    LayersParams,
    NlmParams,
    TilingConfig,
)
from image_denoising_filter_tpu.ops import (
    bilateral,
    bilateral_xla,
    cross_bilateral_layers,
    cross_bilateral_layers_xla,
    nlm_accumulate,
    nlm_xla,
    normalize,
    normalize_xla,
)
from image_denoising_filter_tpu.ops import reference as ref

BP = BilateralParams(radius=3)
NP_ = NlmParams(search_radius=2, patch_radius=1)
LP = LayersParams(radius=3)


def _image(rng, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 5.0),
            0.5 + 0.4 * np.cos(yy / 4.0),
            np.where(xx > w / 2, 0.8, 0.2).astype(np.float32),
            np.ones((h, w), np.float32),
        ],
        axis=-1,
    )
    return np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1).astype(np.float32)


@pytest.fixture
def img(rng):
    return _image(rng)


@pytest.fixture
def img2(rng):
    return _image(np.random.default_rng(99))


@pytest.mark.parametrize("impl", [bilateral, bilateral_xla])
def test_bilateral_matches_oracle(img, impl):
    got = np.asarray(impl(img, BP))
    want = ref.bilateral_reference(img, BP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilateral_zero_border(img):
    p = BilateralParams(radius=3, border=BorderPolicy.ZERO)
    got = np.asarray(bilateral(img, p))
    want = ref.bilateral_reference(img, p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilateral_blue_bug(img):
    p = BilateralParams(radius=3, blue_bug=True)
    got = np.asarray(bilateral(img, p))
    want = ref.bilateral_reference(img, p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilateral_tiling_and_partial_tiles(rng):
    """Halo tiling property: tile size must not change the result, including
    partial edge tiles (29 rows with 8/16-row tiles)."""
    img = _image(rng, h=29, w=32)
    want = ref.bilateral_reference(img, BP)
    for th in (8, 16, 32):
        got = np.asarray(bilateral(img, BP, TilingConfig(tile_h=th, tile_w=128)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=f"tile_h={th}")


@pytest.mark.parametrize("impl", [cross_bilateral_layers, cross_bilateral_layers_xla])
def test_layers_matches_oracle(img, img2, impl):
    wc, nw = impl(img, img2, LP)
    wwc, wnw = ref.cross_bilateral_layers_reference(img, img2, LP)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", [nlm_accumulate, nlm_xla])
def test_nlm_matches_oracle(img, img2, impl):
    wc, nw = impl(img, img2, NP_)
    wwc, wnw = ref.nlm_reference(img, img2, NP_)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)


def test_nlm_full_reference_params_xla(img, img2):
    """Full reference NLM params (s=7, p=3, h=0.5) -- XLA path (the Pallas path
    with full params is covered on real TPU by bench/tpu_check)."""
    p = NlmParams()
    wc, nw = nlm_xla(img, img2, p)
    wwc, wnw = ref.nlm_reference(img, img2, p)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=2e-4, atol=1e-4)


def test_bilateral_full_reference_params_circle_mask(img):
    """Full GPU reference params (radius 20, sigma_s 2.0): the Pallas kernel's
    circular spatial-weight truncation (465 of 1681 taps) stays within the
    documented truncation tolerance of the full-window oracle."""
    p = BilateralParams()  # radius=20, truncate_eps=1e-8 -> disk mask
    got = np.asarray(bilateral(img, p))
    want = ref.bilateral_reference(img, p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilateral_bfloat16_compute_dtype_tolerance(img):
    tiling = TilingConfig(compute_dtype="bfloat16")
    got = np.asarray(bilateral(img, BP, tiling))
    want = ref.bilateral_reference(img, BP)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.03)
    # and it actually changed the arithmetic (knob is live, not decorative)
    exact = np.asarray(bilateral(img, BP))
    assert not np.array_equal(got, exact)


def test_nlm_batched_frames_matches_per_frame_sum(img, img2, rng):
    """nlm_accumulate_frames (one launch, frame axis in the grid) == the sum of
    per-frame partials, each frame contributing its norm seed."""
    from image_denoising_filter_tpu.ops import nlm_accumulate_frames

    img3 = _image(np.random.default_rng(7))
    frames = np.stack([img, img2, img3])
    wc, nw = nlm_accumulate_frames(img, frames, NP_)
    wwc = np.zeros_like(np.asarray(wc))
    wnw = np.zeros_like(np.asarray(nw))
    for fr in frames:
        pwc, pnw = ref.nlm_reference(img, fr, NP_)
        wwc += pwc
        wnw += pnw
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)


def test_nlm_batched_frames_tiled_grid(img, img2):
    """Frame batching composes with multi-tile grids (accumulators must stay
    resident per (i, j) tile while the frame axis advances)."""
    from image_denoising_filter_tpu.ops import nlm_accumulate_frames

    frames = np.stack([img2, img])
    tiling = TilingConfig(tile_h=8, tile_w=128)
    wc, nw = nlm_accumulate_frames(img, frames, NP_, tiling)
    awc, anw = ref.nlm_reference(img, img2, NP_)
    bwc, bnw = ref.nlm_reference(img, img, NP_)
    np.testing.assert_allclose(np.asarray(wc), awc + bwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), anw + bnw, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", [nlm_accumulate, nlm_xla])
@pytest.mark.parametrize(
    "s,p",
    [(2, 1), (6, 3)],  # (6, 3): the bench's trimmed-search gated turbo row
)
def test_nlm_search_stride_matches_strided_oracle(img, img2, impl, s, p):
    """search_stride=2 (the approximate NLM mode) evaluates exactly the strided
    offset subset -- kernel and oracle agree on the reduced candidate set."""
    params = NlmParams(search_radius=s, patch_radius=p, search_stride=2)
    wc, nw = impl(img, img2, params)
    wwc, wnw = ref.nlm_reference(img, img2, params)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", [nlm_accumulate, nlm_xla])
@pytest.mark.parametrize(
    "s,p,st",
    [
        (7, 3, 2),  # the bench disk row: 37 of 196 candidates
        (5, 2, 2),  # asymmetric half-open rows through the segmented loops
        (4, 2, 1),  # disk without stride (147-of-196 analog at small s)
    ],
)
def test_nlm_search_disk_matches_disk_oracle(img, img2, impl, s, p, st):
    """search_disk trims candidates to dy^2+dx^2 <= s^2 -- kernel (segmented
    roll-carry fori loops) and oracle agree on the reduced candidate set,
    composed with and without search_stride."""
    params = NlmParams(
        search_radius=s, patch_radius=p, search_stride=st, search_disk=True
    )
    wc, nw = impl(img, img2, params)
    wwc, wnw = ref.nlm_reference(img, img2, params)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)
    # The trim is live: it must differ from the untrimmed subset.
    base = NlmParams(search_radius=s, patch_radius=p, search_stride=st)
    wc_b, _ = impl(img, img2, base)
    assert not np.array_equal(np.asarray(wc), np.asarray(wc_b))


@pytest.mark.parametrize("disk", [False, True])
@pytest.mark.parametrize(
    "tiling", [None, TilingConfig(tile_h=16, tile_w=128)]  # 24 rows: ragged
)
def test_nlm_weights_halfres_pallas_matches_xla(img, img2, disk, tiling):
    """weights_halfres (half-row-resolution weight field,
    config.NlmParams.weights_halfres): the Pallas kernel's banded-MXU
    pool/roll/upsample path must agree with the independent XLA lowering
    (ops/xla.py halfres branch) -- including ragged row tiles, whose pooling
    lattice must stay on the absolute even-row grid."""
    params = NlmParams(
        search_radius=5, search_stride=2, search_disk=disk, weights_halfres=True
    )
    wc_p, nw_p = nlm_accumulate(img, img2, params, tiling)
    wc_x, nw_x = nlm_xla(img, img2, params)
    np.testing.assert_allclose(
        np.asarray(wc_p), np.asarray(wc_x), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(nw_p), np.asarray(nw_x), rtol=1e-5, atol=1e-6
    )
    # The knob is live: half-res weights differ from the full-res weights.
    base = NlmParams(search_radius=5, search_stride=2, search_disk=disk)
    wc_b, _ = nlm_xla(img, img2, base)
    assert not np.array_equal(np.asarray(wc_x), np.asarray(wc_b))


def test_nlm_weights_halfres_frames_matches_per_frame_sum(img, img2):
    """weights_halfres through the frame-batched kernel (the temporal path):
    one launch over the frame axis == the sum of per-frame XLA partials."""
    from image_denoising_filter_tpu.ops import nlm_accumulate_frames

    params = NlmParams(search_radius=4, search_stride=2, weights_halfres=True)
    frames = np.stack([img2, img])
    wc, nw = nlm_accumulate_frames(img, frames, params)
    awc, anw = nlm_xla(img, img2, params)
    bwc, bnw = nlm_xla(img, img, params)
    np.testing.assert_allclose(
        np.asarray(wc), np.asarray(awc + bwc), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(nw), np.asarray(anw + bnw), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("impl", [nlm_accumulate, nlm_xla])
def test_nlm_weights_halfres_validation(img, img2, impl):
    """weights_halfres is only defined on the stride-2 / p=3 lattice (even dy
    offsets, 3-row half window == the 6-row full box); both lowerings reject
    anything else (tile heights are 8-aligned by _pick_tile, so the in-tile
    half-row lattice needs no separate guard)."""
    with pytest.raises(ValueError):
        impl(img, img2, NlmParams(search_stride=1, weights_halfres=True))
    with pytest.raises(ValueError):
        impl(
            img,
            img2,
            NlmParams(search_stride=2, patch_radius=2, weights_halfres=True),
        )


def test_nlm_bfloat16_compute_dtype_tolerance(img, img2):
    """compute_dtype=bfloat16 (opt-in speed knob): taps are cast to bf16, the
    SSD/weights accumulate in f32. Verify it is wired (output differs from f32
    yet tracks the oracle within bf16 headroom)."""
    tiling = TilingConfig(compute_dtype="bfloat16")
    wc, nw = nlm_accumulate(img, img2, NP_, tiling)
    wwc, wnw = ref.nlm_reference(img, img2, NP_)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=0.1, atol=0.05)


def test_nlm_identical_frames_peak_weight(img):
    """NLM of a frame against itself: the zero-offset candidate has SSD 0 =>
    weight exactly 1 at every pixel, so norm >= 1 + seed."""
    _, nw = nlm_xla(img, img, NP_)
    assert np.all(np.asarray(nw) >= 1.0 + NP_.norm_seed - 1e-6)


@pytest.mark.parametrize("impl", [normalize, normalize_xla])
def test_normalize_matches_oracle(rng, impl):
    wc = rng.uniform(0, 5, (24, 32, 4)).astype(np.float32)
    nw = rng.uniform(0.5, 3, (24, 32)).astype(np.float32)
    nw[3, 5] = 0.0  # sentinel pixel
    got = np.asarray(impl(wc, nw))
    want = ref.normalize_reference(wc, nw)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(got[3, 5], [1.0, 0.0, 1.0, 1.0])


def test_two_pass_equals_fused(img):
    """layers partials + normalize == bilateral with guide==image: with
    layer == target the cross-bilateral degenerates to the plain bilateral."""
    wc, nw = cross_bilateral_layers_xla(img, img, LP)
    two_pass = np.asarray(normalize_xla(wc, nw))
    fused = np.asarray(bilateral_xla(img, BP))
    np.testing.assert_allclose(two_pass, fused, rtol=1e-4, atol=1e-5)


def test_pallas_vs_xla_agree(img):
    """The tiled (Pallas) and linear (XLA) layout variants must agree, like the
    reference's bialteral.comp vs bialteral_linear.comp."""
    a = np.asarray(bilateral(img, BP))
    b = np.asarray(bilateral_xla(img, BP))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_nlm_zero_border(img, img2):
    p = NlmParams(search_radius=2, patch_radius=1, border=BorderPolicy.ZERO)
    wc, nw = nlm_accumulate(img, img2, p)
    wwc, wnw = ref.nlm_reference(img, img2, p)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)


def test_layers_blue_bug(img, img2):
    p = LayersParams(radius=3, blue_bug=True)
    wc, nw = cross_bilateral_layers(img, img2, p)
    wwc, wnw = ref.cross_bilateral_layers_reference(img, img2, p)
    np.testing.assert_allclose(np.asarray(wc), wwc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), wnw, rtol=1e-4, atol=1e-5)


def test_bilateral_xla_differentiable(img):
    """The XLA variant is differentiable end-to-end (denoiser-in-the-loop
    training use case)."""
    import jax
    import jax.numpy as jnp

    def loss(x):
        return jnp.sum(bilateral_xla(x, BP) ** 2)

    g = jax.grad(loss)(jnp.asarray(img))
    assert g.shape == img.shape
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_bilateral_window_larger_than_image(rng):
    """Stencil window larger than the image: clamp padding + partial tiles
    must still match the oracle (8x16 image, radius 6 => 13x13 window)."""
    img = rng.uniform(0, 1, (8, 16, 4)).astype(np.float32)
    p = BilateralParams(radius=6, sigma_spatial=10.0)
    got = np.asarray(bilateral(img, p))
    want = ref.bilateral_reference(img, p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", [bilateral, bilateral_xla])
def test_bilateral_uniform_alpha_exact(img, impl):
    """The uniform-alpha fast path must match the full kernel exactly when
    alpha is one constant (sum(w*a) == a*sum(w))."""
    img = img.copy()
    img[..., 3] = 0.625
    full = np.asarray(impl(img, BP))
    fast = np.asarray(impl(img, BilateralParams(radius=3, uniform_alpha=True)))
    np.testing.assert_allclose(fast, full, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", [nlm_accumulate, nlm_xla])
def test_nlm_uniform_alpha_exact(img, img2, impl):
    img2 = img2.copy()
    img2[..., 3] = 1.0
    wc_full, nw_full = impl(img, img2, NP_)
    p = NlmParams(search_radius=2, patch_radius=1, uniform_alpha=True)
    wc_fast, nw_fast = impl(img, img2, p)
    np.testing.assert_allclose(np.asarray(wc_fast), np.asarray(wc_full), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nw_fast), np.asarray(nw_full), rtol=1e-6)
