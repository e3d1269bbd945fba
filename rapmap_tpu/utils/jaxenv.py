"""Process-level JAX environment setup shared by CLI, bench, and driver hooks."""

from __future__ import annotations

import os


def setup(force_cpu: bool | None = None, cache_dir: str = "/root/.cache/jax") -> None:
    """Configure the persistent compile cache and (optionally) force the CPU
    backend. Must run before the first JAX computation; safe to call twice.

    force_cpu=None reads TQM_FORCE_CPU=1 from the environment. The axon
    sitecustomize pins JAX_PLATFORMS to the TPU, so env vars alone don't work —
    config.update before backend init does.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if force_cpu is None:
        force_cpu = os.environ.get("TQM_FORCE_CPU") == "1"
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
