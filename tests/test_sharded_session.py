"""Session with a device mesh: the sharded battery must match the
single-device battery (on the virtual 8-device CPU mesh)."""

import numpy as np
import pytest

from image_denoising_filter_tpu.config import (
    BilateralParams,
    LayersParams,
    NlmParams,
    RunConfig,
)
from image_denoising_filter_tpu.runtime import Session
from image_denoising_filter_tpu.utils import imageio

BP = BilateralParams(radius=3)
LP = LayersParams(radius=3)
NP_ = NlmParams(search_radius=2, patch_radius=1)


def _make_anim(tmp_path, n_frames=4):
    import os

    rng = np.random.default_rng(0)
    root = str(tmp_path / "anim")
    os.makedirs(root + "/RenderElements", exist_ok=True)
    for i in range(n_frames):
        imageio.save(
            f"{root}/frame_{i:04d}.png",
            rng.uniform(0, 1, (48, 64, 4)).astype(np.float32),
        )
    imageio.save(
        f"{root}/RenderElements/albedo_0001.png",
        rng.uniform(0, 1, (48, 64, 4)).astype(np.float32),
    )
    return f"{root}/frame_0001.png"


@pytest.mark.parametrize(
    "cfg",
    [
        RunConfig(),
        RunConfig(use_layers=True),
        RunConfig(nlm=True),
        RunConfig(nlm=True, multiframe=True),
        RunConfig(nlm=True, multiframe=True, overlap=True),
    ],
    ids=["bilateral", "layers", "nlm", "multiframe", "overlap"],
)
def test_sharded_session_matches_single(tmp_path, cfg):
    target = _make_anim(tmp_path)
    kw = dict(
        bilateral_params=BP, layers_params=LP, nlm_params=NP_, output_dir=str(tmp_path)
    )
    single = Session(target, **kw).run(cfg)
    sharded = Session(target, mesh_shape=(2, 4), **kw).run(cfg)
    np.testing.assert_allclose(sharded.image, single.image, rtol=1e-4, atol=1e-5)


def test_sharded_session_odd_rows(tmp_path):
    """47 rows don't divide the 4-way 'y' axis: row padding + crop must be
    invisible."""
    rng = np.random.default_rng(1)
    target = str(tmp_path / "odd_0000.png")
    imageio.save(target, rng.uniform(0, 1, (47, 64, 4)).astype(np.float32))
    kw = dict(bilateral_params=BP, output_dir=str(tmp_path))
    single = Session(target, **kw).run(RunConfig())
    sharded = Session(target, mesh_shape=(1, 4), **kw).run(RunConfig())
    assert sharded.image.shape == (47, 64, 4)
    np.testing.assert_allclose(sharded.image, single.image, rtol=1e-4, atol=1e-5)


def test_sharded_session_turbo(tmp_path):
    """Sharded turbo (mesh set): pads rows to shard*downsample multiples, runs
    the row-sharded grid pipeline, and crops -- bit-equal to the single-device
    grid pipeline on the same padded frame."""
    import jax.numpy as jnp

    from image_denoising_filter_tpu.ops import fast

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (50, 64, 4)).astype(np.float32)
    target = str(tmp_path / "turbo_0000.png")
    imageio.save(target, img)
    bp = BilateralParams()  # reference sigmas (effective radius 13)
    sess = Session(target, bilateral_params=bp, output_dir=str(tmp_path),
                   mesh_shape=(1, 2))
    res = sess.run_turbo(RunConfig(), levels=8, downsample=2)
    assert res.image.shape == (50, 64, 4)

    # Single-device grid pipeline on the same edge-padded frame (52 rows).
    loaded, _ = imageio.load(target)
    padded = np.pad(loaded, ((0, 2), (0, 0), (0, 0)), mode="edge")
    planar = jnp.transpose(jnp.asarray(padded), (2, 0, 1))
    rgb = planar[:3]
    lmin = jnp.min(rgb, axis=(1, 2))
    lmax = jnp.max(rgb, axis=(1, 2))
    step = jnp.maximum(lmax - lmin, 1e-6) / 7
    want = np.transpose(
        np.asarray(fast._grid_pipeline_planar(planar, bp, 8, 2)),
        (1, 2, 0),
    )[:50]
    # ~1 ulp: MXU tree-reduction grouping in the build kernel's blur matmuls
    # shifts with the tap band's offset inside shard tiles (test_sharding.py).
    np.testing.assert_allclose(res.image, want, rtol=3e-6, atol=3e-7)
