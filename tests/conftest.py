"""Test configuration: CPU-only JAX with 8 virtual devices and x64.

Multi-chip behavior is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) per SURVEY.md section 4; float64 is
enabled so golden parity tests against the float64 NumPy oracle are exact
to ~1e-10.
"""

import os

if not os.environ.get("PHYLO_TPU_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("PHYLO_TPU_TEST_ON_TPU"):
    # The axon TPU plugin pins jax_platforms at interpreter startup
    # (sitecustomize); the config update is the reliable override.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
