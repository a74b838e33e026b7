"""Test config: force an 8-virtual-device CPU platform.

The baked axon sitecustomize pins the TPU platform via jax.config (it
overrides JAX_PLATFORMS=cpu from the env), so the override must be done
via jax.config before the backend is first initialized.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_TEST = "/root/reference/test"


@pytest.fixture(scope="session")
def ref_test_dir():
    return REF_TEST
