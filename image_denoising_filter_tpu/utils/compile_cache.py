"""Persistent XLA compilation cache.

Radius-20 stencil kernels take 1-3 minutes to compile via Mosaic; the
persistent cache makes repeat CLI/bench invocations start in seconds -- the
analog of shipping precompiled SPIR-V (the reference compiles shaders once in
compile_shaders.sh, not per run)."""

from __future__ import annotations

import os


def enable() -> None:
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/idf_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
