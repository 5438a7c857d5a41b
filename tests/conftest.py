"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(zkvm_tpu.parallel) compile and execute without TPU hardware, and so
concurrent test runs don't contend for the single real chip.

NOTE: this environment's axon TPU plugin force-overrides the JAX_PLATFORMS
env var (jax.config.jax_platforms comes up as "axon,cpu" regardless), so we
must use jax.config.update *before the backend initializes* — env vars and
XLA_FLAGS are silently ignored.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import random

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(n): advisory per-test budget (no-op without pytest-timeout)",
    )
    config.addinivalue_line(
        "markers",
        "heavy: slow XLA-CPU compiles (interpret-mode Pallas, sharded-mesh "
        "shapes, 2^15 R1CS) — excluded from the smoke tier; run the full "
        "suite with plain `pytest tests/ -n 8`, the smoke tier with "
        "`pytest tests/ -m 'not heavy' -n 8` (< 8 min)",
    )


@pytest.fixture
def rng():
    return random.Random(1234)
