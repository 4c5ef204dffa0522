"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the virtual mesh; the driver separately
dry-runs the multi-chip path (see __graft_entry__.dryrun_multichip) and runs
bench.py on real TPU hardware.
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
