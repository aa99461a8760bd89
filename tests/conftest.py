"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 lesson: the reference
had zero distributed tests — we fake a mesh instead).

Note: this image's sitecustomize force-registers the axon TPU plugin and
overrides jax_platforms, so the env var alone is not enough — we override the
config after import, before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(777)
