"""Test configuration.

The env below requests a virtual 8-device CPU mesh, which applies when jax
has not been imported yet at conftest time (plain CPU machines, CI).  On
the axon image, sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon, so the suite runs against the REAL TPU chip through
the tunnel — a stronger signal (the pallas kernels actually compile).
Multi-device sharding is validated by the driver's
__graft_entry__.dryrun_multichip, launched with JAX_PLATFORMS=cpu in the
process environment (which does win over sitecustomize).
"""

import os

# The axon TPU plugin (sitecustomize in /root/.axon_site) force-sets
# JAX_PLATFORMS=axon when PALLAS_AXON_POOL_IPS is present; clear it so tests
# run on the virtual CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "data")
REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def golden_dir():
    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip("golden data not generated (see tests/golden/gen_golden.cc)")
    return GOLDEN_DIR
