"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md section 4)."""

import os

# Must be set before jax imports anywhere in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib

import pytest

REFERENCE_MODELS = pathlib.Path("/root/reference/examples/models")


@pytest.fixture(scope="session")
def models_dir():
    if not REFERENCE_MODELS.exists():
        pytest.skip("reference model assets not available")
    return REFERENCE_MODELS
