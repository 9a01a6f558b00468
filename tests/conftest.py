"""Test configuration: run everything on CPU with 8 virtual devices so
sharding tests exercise a real Mesh without TPU hardware.

Note: this environment preloads jax and registers the TPU ('axon')
backend from a sitecustomize at interpreter start, so env vars set
here are too late — use jax.config.update, which works post-import.
"""

import os

if os.environ.get("RSSYNC_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
# else: RSSYNC_TPU_TESTS=1 keeps the session's real backend so the
# `-m tpu` tests compile Pallas kernels on the chip (tests/test_tpu.py)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
