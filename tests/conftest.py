"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 lesson: the reference
had zero distributed tests — we fake a mesh instead).

Note: this image's sitecustomize force-registers the axon TPU plugin and
overrides jax_platforms, so the env var alone is not enough — we override the
config after import, before any backend is initialized."""

import os

# APS_TPU_TEST=1 switches to the opt-in real-chip tier (tests/tpu/): the
# axon TPU plugin stays registered and tests marked `tpu` run on hardware
ON_CHIP = os.environ.get("APS_TPU_TEST") == "1"

if not ON_CHIP:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fast tier is compile-dominated (a cold
# run spends ~90% of its wall time in XLA). Cached executables are keyed by
# platform+config hash, so the CPU tier and the real-chip tier never
# collide. Threshold 0.5 s: beam-search/trainer programs take minutes to
# compile; trivial jits aren't worth the disk.
from aps_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(777)
