"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device emulation instead. The axon sitecustomize registers
the TPU plugin at interpreter start, so we must override the platform through
jax.config (env vars are read too early to set here).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# CI always exercises the fused 3D update kernels (interpret mode on CPU);
# the env default only guards unvalidated Mosaic lowering on real chips.
os.environ.setdefault("CAMLIFLOW_UPDATE3D", "1")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: takes >2 min; deselect with -m 'not slow'"
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
