"""Test configuration: CPU backend with 8 virtual devices, float64 parity mode.

The reference test suite is pytest, single-process, CPU, with a random seed per
session (``/root/reference/tests/conftest.py:6-8``).  Here we additionally
force an 8-device CPU topology so multi-chip sharding paths are exercised
without TPU hardware (SURVEY.md section 7, "Environment" notes).
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Must happen before any jax computation: the axon TPU plugin registers itself
# via JAX_PLATFORMS=axon in the environment; tests run on host CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def seed():
    """Random 32-bit seed per test run (reference ``tests/conftest.py:6-8``)."""
    return random.getrandbits(32)


@pytest.fixture
def rng(seed):
    return np.random.default_rng(seed)
