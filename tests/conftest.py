"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4 item 4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's parallel codegen dead/livelocks on this engine's HLO (observed:
# futex-blocked "compiles" of 100-430s with 0% CPU); serial codegen is fast
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize force-registers the TPU and overrides JAX_PLATFORMS;
# config.update after import (before backend init) reliably selects CPU
jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache under pytest: jaxlib's executable
# (de)serialization segfaults flakily on some of this suite's CPU programs
# (observed in both put_ and get_executable_and_time; a crashed write then
# leaves a truncated entry that segfaults every later read). The cache only
# pays across sessions — a full suite run compiles the same either way —
# while production (CLI/bench, rapmap_tpu.utils.jaxenv) keeps it for the
# 100-700 s TPU compiles.
jax.config.update("jax_compilation_cache_dir", None)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
