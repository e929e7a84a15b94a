"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host platform devices
(xla_force_host_platform_device_count) since tests run without TPUs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env has axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep test numerics deterministic & fast
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize (TPU tunnel) imports jax at interpreter start,
# so the env vars above may be too late; force the platform through the
# config API as well (backends resolve lazily at first computation).
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
REFERENCE_DATA = os.path.join(REFERENCE_DIR, "data")
TEST_IFS_DIR = os.path.join(REFERENCE_DIR, "test", "ifs")


@pytest.fixture(scope="session")
def reference_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference data directory not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def test_ifs_dir():
    if not os.path.isdir(TEST_IFS_DIR):
        pytest.skip("reference test/ifs directory not available")
    return TEST_IFS_DIR
