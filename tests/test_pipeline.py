"""End-to-end pipeline tests: models, session, prefetch, CLI battery.

Small images + small radii keep CPU interpret-mode compile times sane.
"""

import os

import numpy as np
import pytest

from image_denoising_filter_tpu.config import (
    BilateralParams,
    GPU_BATTERY,
    LayersParams,
    NlmParams,
    RunConfig,
)
from image_denoising_filter_tpu.models import (
    BilateralDenoiser,
    LayerGuidedDenoiser,
    NlmDenoiser,
    TemporalNlmDenoiser,
)
from image_denoising_filter_tpu.ops import reference as ref
from image_denoising_filter_tpu.runtime import FramePrefetcher, Session
from image_denoising_filter_tpu.utils import imageio

BP = BilateralParams(radius=3)
LP = LayersParams(radius=3)
NP_ = NlmParams(search_radius=2, patch_radius=1)


def _frame(seed, h=24, w=32):
    rng = np.random.default_rng(seed)
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


def test_temporal_nlm_model_matches_oracle():
    target = _frame(0)
    frames = np.stack([_frame(i) for i in range(3)])
    model = TemporalNlmDenoiser(NP_)
    got = np.asarray(model(target, frames))

    wc = np.zeros(target.shape, np.float32)
    nw = np.zeros(target.shape[:2], np.float32)
    for f in frames:
        pwc, pnw = ref.nlm_reference(target, f, NP_)
        wc += pwc
        nw += pnw
    want = ref.normalize_reference(wc, nw)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_temporal_streaming_equals_scan():
    """accumulate_one folded frame-by-frame must equal the scan model."""
    target = _frame(0)
    frames = [_frame(i) for i in range(3)]
    model = TemporalNlmDenoiser(NP_)
    carry = None
    for f in frames:
        carry = model.accumulate_one(target, f, carry)
    got = np.asarray(model.finalize(carry))
    want = np.asarray(model(target, np.stack(frames)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layer_guided_model_matches_oracle():
    target = _frame(0)
    layers = np.stack([_frame(7), _frame(8)])
    model = LayerGuidedDenoiser(LP)
    got = np.asarray(model(target, layers))

    wc = np.zeros(target.shape, np.float32)
    nw = np.zeros(target.shape[:2], np.float32)
    for l in layers:
        pwc, pnw = ref.cross_bilateral_layers_reference(target, l, LP)
        wc += pwc
        nw += pnw
    want = ref.normalize_reference(wc, nw)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_prefetcher_order_and_depth():
    items = list(range(7))
    seen = []
    pf = FramePrefetcher(items, lambda i: np.full((2, 2, 4), float(i), np.float32))
    for i, dev in enumerate(pf):
        seen.append(float(np.asarray(dev)[0, 0, 0]))
    assert seen == [float(i) for i in items]


def test_timing_report_counters_disjoint():
    """A transfer() entered inside execute() (prefetch upload under the kernel)
    is credited to transfer_ns and excluded from exec_ns -- the reference keeps
    exec (t1-t0) and transfer (t2-t1) disjoint (src/main.cpp:1095-1102)."""
    import time

    from image_denoising_filter_tpu.utils.timing import TimingReport

    rep = TimingReport()
    wall0 = time.perf_counter_ns()
    with rep.execute():
        time.sleep(0.02)
        with rep.transfer():
            time.sleep(0.03)
        time.sleep(0.01)
    wall = time.perf_counter_ns() - wall0
    assert rep.transfer_ns >= 25_000_000
    assert rep.exec_ns >= 20_000_000
    # no double count: the two counters partition the wall time
    assert abs((rep.exec_ns + rep.transfer_ns) - wall) < 10_000_000


def test_session_overlap_timing_not_double_counted(tmp_path):
    """Overlap-path report: exec + transfer stay within the run's wall time
    (previously prefetch uploads were counted in BOTH)."""
    import time

    target = _make_anim(tmp_path, n_frames=4)
    session = Session(
        target, nlm_params=NP_, output_dir=str(tmp_path), warmup=True
    )
    cfg = RunConfig(nlm=True, multiframe=True, overlap=True)
    t0 = time.perf_counter_ns()
    result = session.run(cfg)
    wall = time.perf_counter_ns() - t0
    rep = result.report
    assert rep.exec_ns > 0 and rep.transfer_ns > 0
    assert rep.exec_ns + rep.transfer_ns <= wall


def _make_anim(tmp_path, n_frames=3, with_layers=True):
    root = str(tmp_path / "anim")
    os.makedirs(root + "/RenderElements", exist_ok=True)
    for i in range(n_frames):
        imageio.save(f"{root}/frame_{i:04d}.png", _frame(i))
    if with_layers:
        imageio.save(f"{root}/RenderElements/albedo_0001.png", _frame(50))
        imageio.save(f"{root}/RenderElements/normal_0001.png", _frame(51))
    tid = min(1, n_frames - 1)
    return f"{root}/frame_{tid:04d}.png"


@pytest.mark.parametrize(
    "cfg",
    GPU_BATTERY,
    ids=["bilateral", "layers", "linear", "nlm", "multiframe", "overlap"],
)
def test_session_battery(tmp_path, cfg):
    """Every battery config runs end-to-end and writes its flag-encoded file
    (src/main.cpp:1953-1973 + 1677-1682)."""
    target = _make_anim(tmp_path)
    session = Session(
        target,
        bilateral_params=BP,
        layers_params=LP,
        nlm_params=NP_,
        output_dir=str(tmp_path),
    )
    result = session.run(cfg)
    assert os.path.basename(result.output_path) == cfg.output_name(False)
    assert os.path.exists(result.output_path)
    out, hdr = imageio.load(result.output_path)
    assert not hdr and out.shape == (24, 32, 4)
    # Timing was recorded.
    assert result.report.exec_ns > 0
    assert result.report.transfer_ns > 0


def test_session_overlap_drops_last_frame(tmp_path):
    """Reference parity: the overlap loop dispatches NLM on the previous
    texture while copying the next frame (src/main.cpp:1554-1572), so the last
    uploaded frame is never filtered. Overlap output == temporal NLM over
    frames[:-1]; with identical frame sets the schedules agree exactly."""
    from image_denoising_filter_tpu.models import TemporalNlmDenoiser
    from image_denoising_filter_tpu.utils import dataset as dataset_mod

    target = _make_anim(tmp_path, n_frames=4)
    session = Session(target, nlm_params=NP_, output_dir=str(tmp_path))
    b = session.run(RunConfig(nlm=True, multiframe=True, overlap=True))

    ds = dataset_mod.discover(target, multiframe=True)
    model = TemporalNlmDenoiser(NP_)
    timg, _ = imageio.load(target)
    frames = np.stack([imageio.load(p)[0] for p in ds.frames[:-1]])
    want = np.asarray(model(timg, frames))
    got = b.image
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # And it genuinely differs from the all-frames run (one fewer norm seed).
    a = session.run(RunConfig(nlm=True, multiframe=True))
    assert not np.allclose(a.image, b.image)


def test_session_cpu_path(tmp_path):
    target = _make_anim(tmp_path, n_frames=1, with_layers=False)
    session = Session(target, output_dir=str(tmp_path))
    path, secs = session.run_cpu(1)
    assert os.path.exists(path) and path.endswith("output-cpu.png")
    out, _ = imageio.load(path)
    # CPU path: border is zeroed (radius 10 > half of 24-row image -> most is
    # border; just check the file decodes and the border really is zero).
    assert np.all(out[0] == 0.0)


def test_session_hdr_roundtrip(tmp_path):
    """EXR target => EXR outputs with alpha preserved (README.md:57-59)."""
    root = str(tmp_path / "hdr")
    os.makedirs(root, exist_ok=True)
    img = _frame(0) * 3.0  # HDR-range values
    img[..., 3] = 0.5  # non-trivial alpha
    imageio.save(f"{root}/shot_0000.exr", img)
    session = Session(f"{root}/shot_0000.exr", bilateral_params=BP, output_dir=root)
    result = session.run(RunConfig())
    assert result.output_path.endswith("output-nonlinear-bialteral.exr")
    out, hdr = imageio.load(result.output_path)
    assert hdr
    # Alpha: constant 0.5 in, so weighted mean alpha == 0.5 out.
    np.testing.assert_allclose(out[..., 3], 0.5, atol=1e-5)


def test_uniform_alpha_not_applied_with_zero_border(tmp_path):
    """ZERO border injects alpha-0 taps with nonzero weight, so the
    uniform-alpha fast path would corrupt border alpha -- Session must not
    auto-enable it (code-review regression test)."""
    from image_denoising_filter_tpu.config import BorderPolicy
    from image_denoising_filter_tpu.ops import reference as ref_ops

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (24, 32, 4)).astype(np.float32)
    img[..., 3] = 1.0  # constant alpha triggers the auto-detect
    target = str(tmp_path / "z_0000.png")
    imageio.save(target, img)
    img_q = imageio.to_float(imageio.quantize(img))
    p = BilateralParams(radius=3, border=BorderPolicy.ZERO)
    r = Session(target, bilateral_params=p, output_dir=str(tmp_path)).run(RunConfig())
    want = ref_ops.bilateral_reference(img_q, p)
    np.testing.assert_allclose(r.image, want, rtol=1e-4, atol=1e-5)


def test_batch_frames_equals_streamed(tmp_path):
    """batch_frames=True (one stacked upload + one frame-batched kernel
    launch) must produce the exact same multiframe output as the per-frame
    streamed dispatch loop."""
    target = _make_anim(tmp_path, n_frames=4, with_layers=False)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    os.makedirs(out_a, exist_ok=True)
    os.makedirs(out_b, exist_ok=True)
    cfg = RunConfig(nlm=True, multiframe=True)
    streamed = Session(target, nlm_params=NP_, output_dir=out_a).run(cfg)
    batched = Session(
        target, nlm_params=NP_, output_dir=out_b, batch_frames=True
    ).run(cfg)
    np.testing.assert_allclose(
        batched.image, streamed.image, rtol=1e-5, atol=1e-6
    )
    assert os.path.exists(batched.output_path)


def test_batch_frames_mixed_alpha_full_kernel(tmp_path):
    """A varying-alpha frame in the batch must force the full (non-uniform-
    alpha) batched kernel, keeping exactness."""
    root = str(tmp_path / "mixb")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(3):
        f = _frame(i)
        if i == 2:
            f = f.copy()
            f[..., 3] = rng.uniform(0, 1, f.shape[:2]).astype(np.float32)
        imageio.save(f"{root}/frame_{i:04d}.png", f)
    target = f"{root}/frame_0001.png"
    out_a = str(tmp_path / "sa")
    out_b = str(tmp_path / "sb")
    os.makedirs(out_a, exist_ok=True)
    os.makedirs(out_b, exist_ok=True)
    cfg = RunConfig(nlm=True, multiframe=True)
    streamed = Session(target, nlm_params=NP_, output_dir=out_a).run(cfg)
    batched = Session(
        target, nlm_params=NP_, output_dir=out_b, batch_frames=True
    ).run(cfg)
    np.testing.assert_allclose(
        batched.image, streamed.image, rtol=1e-5, atol=1e-6
    )


def test_multiframe_mixed_alpha_frames_exact(tmp_path):
    """Per-frame uniform-alpha selection: constant-alpha frames take the fast
    kernel, a varying-alpha frame takes the full kernel, and the mixed
    accumulation must equal the all-full-path temporal model."""
    root = str(tmp_path / "mix")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(11)
    frames = []
    for i in range(3):
        f = _frame(i)
        if i == 2:
            f = f.copy()
            f[..., 3] = rng.uniform(0, 1, f.shape[:2]).astype(np.float32)
        frames.append(f)
        imageio.save(f"{root}/frame_{i:04d}.png", f)
    target = f"{root}/frame_0001.png"
    # separate output dir: outputs written into the frames dir would be
    # discovered as frames by the later discover() (the reference has the
    # same hazard when run from inside the dataset directory)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    session = Session(target, nlm_params=NP_, output_dir=out_dir)
    got = session.run(RunConfig(nlm=True, multiframe=True)).image

    from image_denoising_filter_tpu.utils import dataset as dataset_mod

    ds = dataset_mod.discover(target, multiframe=True, max_frames=None)
    timg, _ = imageio.load(target)
    stack = np.stack([imageio.load(p)[0] for p in ds.frames])
    model = TemporalNlmDenoiser(NP_)  # full path everywhere
    want = np.asarray(model(timg, stack))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_run_turbo_default_levels_per_d(tmp_path):
    """levels=None resolves the per-d default: K=5 at downsample 2 and 4
    for BOTH families (bilateral: identical dB to K=6 at every d, +10-16%
    at d=4 / +11-13% at d=2 on chip in round 4; layers: within 0.1-0.3 dB,
    +7.2% at d=2 / +18-51% at d=4 interleaved in round 5 --
    tools/layers_k_ab_r4.py), K=6 at other d. Explicit levels= always
    wins."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (24, 32, 4)).astype(np.float32)
    img[..., 3] = 1.0
    target = str(tmp_path / "turbo_0000.png")
    imageio.save(target, img)
    os.makedirs(tmp_path / "RenderElements", exist_ok=True)
    imageio.save(str(tmp_path / "RenderElements" / "albedo_0000.png"), img)

    def fresh():
        return Session(target, bilateral_params=BP, layers_params=LP,
                       output_dir=str(tmp_path))

    cfg = RunConfig()
    for d in (2, 4):
        d_default = fresh().run_turbo(cfg, downsample=d).image
        d_k5 = fresh().run_turbo(cfg, levels=5, downsample=d).image
        d_k6 = fresh().run_turbo(cfg, levels=6, downsample=d).image
        np.testing.assert_array_equal(d_default, d_k5)
        assert np.any(d_default != d_k6)

    d8_default = fresh().run_turbo(cfg, downsample=8).image
    d8_k6 = fresh().run_turbo(cfg, levels=6, downsample=8).image
    np.testing.assert_array_equal(d8_default, d8_k6)

    lcfg = RunConfig(use_layers=True)
    l_default = fresh().run_turbo(lcfg, downsample=2).image
    l_k5 = fresh().run_turbo(lcfg, levels=5, downsample=2).image
    l_k6 = fresh().run_turbo(lcfg, levels=6, downsample=2).image
    np.testing.assert_array_equal(l_default, l_k5)
    assert np.any(l_default != l_k6)
