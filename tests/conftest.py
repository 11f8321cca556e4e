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
# CPU test compiles are fast and numerous; the persistent compilation
# cache buys nothing here and its zstd writer segfaulted the suite once
# (tests that exercise cli.runner.main flip the cache dir on for the
# whole process otherwise).
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables + tracing caches between test modules.

    Nearly every test jits a fresh local closure, so the in-process
    caches only accumulate dead entries across modules -- and with the
    round-3 suite size (250+ tests) the accumulated state flakily
    SEGFAULTED XLA:CPU's compiler around test #220 (three full-suite
    runs: twice in backend_compile_and_load, once in the zstd cache
    writer; the same tests pass standalone).  Bounding the state per
    module keeps the suite green; it costs nothing because there is no
    meaningful cross-module cache reuse.
    """
    yield
    jax.clear_caches()
