"""Process-level JAX environment setup shared by CLI, bench, and driver hooks."""

from __future__ import annotations

import os


def setup(force_cpu: bool | None = None, cache_dir: str | None = None) -> None:
    """Configure the persistent compile cache and (optionally) force the CPU
    backend. Must run before the first JAX computation; safe to call twice.

    cache_dir=None means "the production default, unless an earlier setup()
    already chose one" — so a script's explicit setup(cache_dir=...) survives
    the import-time setup() calls of modules it then imports (bench.py et
    al.), while an explicit dir always wins. force_cpu=None reads
    TQM_FORCE_CPU=1 from the environment. The axon sitecustomize pins
    JAX_PLATFORMS to the TPU, so env vars alone don't work — config.update
    before backend init does.
    """
    import jax

    try:
        if cache_dir is not None or jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir", cache_dir or "/root/.cache/jax"
            )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if force_cpu is None:
        force_cpu = os.environ.get("TQM_FORCE_CPU") == "1"
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
