"""Test configuration: virtual 8-device CPU mesh + float64 enabled.

Tests run on CPU so that (a) the float64 parity path can hit the reference's
1e-12 accuracy gates (reference: test/testIIR.cpp:59), and (b) multi-device
sharding is exercised on an 8-device virtual mesh without a TPU pod
(SURVEY.md §4 "porting the methodology").  Benchmarks (bench.py) run on the
real TPU chip instead.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5D5B)
