"""Test session config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests need multiple devices; real TPU pods aren't available
in CI, so we use XLA's host-platform device-count override (the fake backend the
reference lacks -- SURVEY.md section 4). Must be set before jax is imported
anywhere, hence this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/tpu: tests use the fake mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("IDF_NO_PROGRESS", "1")

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides JAX_PLATFORMS; force it back so tests
# never touch the real chip (and don't pay the remote handshake).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def small_image(rng):
    """A small piecewise-smooth noisy RGBA test image (float32, [0, 1])."""
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 9.0),
            0.5 + 0.4 * np.cos(yy / 7.0),
            np.where(xx > w / 2, 0.8, 0.2).astype(np.float32),
            np.ones((h, w), np.float32),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 0.05, (h, w, 4)).astype(np.float32)
    noise[..., 3] = 0.0
    return np.clip(base + noise, 0.0, 1.0).astype(np.float32)
