"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md section 4).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (the real
TPU tunnel), so env vars alone don't stick — we must also update
jax.config after import. XLA_FLAGS still must be set before the first
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_MODELS = pathlib.Path("/root/reference/examples/models")


@pytest.fixture(scope="session")
def models_dir():
    if not REFERENCE_MODELS.exists():
        pytest.skip("reference model assets not available")
    return REFERENCE_MODELS
