"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(zkvm_tpu.parallel) compile and execute without TPU hardware, per the
driver's dryrun contract.  Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env points at the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(1234)
