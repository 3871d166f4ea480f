"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The axon TPU tunnel is slow for eager/test workloads and multi-chip
hardware is unavailable; all tests run on the host CPU, with an 8-device
virtual mesh for the dist/ tests (SURVEY.md §4).

NOTE: the axon site package overrides JAX_PLATFORMS, so we must use
JAX_PLATFORM_NAME (and set it before jax is imported).
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries.

    The full suite compiles hundreds of XLA:CPU programs in one
    process; past a cumulative threshold the compiler itself segfaults
    on an otherwise-fine program (reproduced twice at the same late
    test, while every subset of the suite passes — the crash follows
    accumulated compiler state, not any particular program). Dropping
    the jit caches between modules bounds that accumulation; modules
    rarely share compiled shapes, so the re-compile cost is small."""
    yield
    import jax

    jax.clear_caches()
